from . import dsvi  # noqa: F401
from .dsvi import DSVIConfig, DSVIResult, inference  # noqa: F401

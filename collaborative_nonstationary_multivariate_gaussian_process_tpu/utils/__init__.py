from . import checkpoint, data, empirical, metrics, posterior_analysis, sim  # noqa: F401

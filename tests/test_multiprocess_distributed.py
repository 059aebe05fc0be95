"""True multi-process `jax.distributed` test (VERDICT round-2 item 5).

Spawns 2 CPU processes with a localhost coordinator and asserts that
`initialize_distributed` joins them into one SPMD program, `make_pod_mesh`
spans both processes' devices, and the host-local loading path
(`process_local_blocks` + `global_batch_from_local`) reconstructs the global
array across *real* process boundaries (each process feeds only its rows;
a psum over the global array must still see every row).

This upgrades SURVEY.md §4's fake-backend prescription to actual
multi-process execution.  Reference scope: none — the reference is
single-process (SURVEY.md §5.8); this layer is new work.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import json, os, sys

    # CPU backend with 2 virtual devices per process (4 global over 2 procs)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.environ["CNMGP_REPO"])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.mesh import (
        DATA_AXIS,
        global_batch_from_local,
        initialize_distributed,
        make_pod_mesh,
        process_local_blocks,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid, pcount = initialize_distributed(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["PROC_ID"]),
    )
    assert pcount == 2, pcount
    assert pid == int(os.environ["PROC_ID"]), (pid, os.environ["PROC_ID"])
    # idempotent second call
    assert initialize_distributed() == (pid, pcount)

    ndev = jax.device_count()
    assert ndev == 4, ndev
    mesh = make_pod_mesh(chain=1)
    procs_on_mesh = {d.process_index for d in mesh.devices.ravel()}
    assert procs_on_mesh == {0, 1}, procs_on_mesh

    # host-local loading: each process materializes only its rows
    n_rows = 8
    full = np.arange(n_rows * 3, dtype=np.float64).reshape(n_rows, 3)
    blocks = process_local_blocks(mesh, n_rows)
    assert blocks, "this process owns no data-axis rows"
    local = np.concatenate([full[s : s + n] for s, n in blocks], axis=0)
    assert local.shape[0] == n_rows // 2, local.shape

    g = global_batch_from_local(mesh, {"x": local})["x"]
    assert g.shape == (n_rows, 3), g.shape

    # a global reduction must see every row from both processes
    with mesh:
        total = jax.jit(
            lambda a: jnp.sum(a),
            in_shardings=NamedSharding(mesh, P(DATA_AXIS)),
            out_shardings=NamedSharding(mesh, P()),
        )(g)
    out = {
        "pid": pid,
        "pcount": pcount,
        "ndev": ndev,
        "mesh_shape": dict(mesh.shape),
        "sum": float(total),
        "expected_sum": float(full.sum()),
    }
    print("RESULT " + json.dumps(out))
    """
)


def test_package_import_does_not_touch_backend():
    """Importing the package must not initialize the XLA backend — otherwise
    `jax.distributed.initialize` (which must run first on pods) always fails.
    Regression guard for the module-level `jnp.log(2*pi)` constant."""
    code = textwrap.dedent(
        """
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path.insert(0, os.environ["CNMGP_REPO"])
        import jax
        import jax._src.xla_bridge as xb
        import collaborative_nonstationary_multivariate_gaussian_process_tpu
        assert not xb._backends, "package import initialized the XLA backend"
        print("IMPORT_PURE")
        """
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("TPU_", "JAX_", "AXON_", "PALLAS_AXON_"))
    }
    env.update(CNMGP_REPO=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "IMPORT_PURE" in out.stdout


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env_base = {
        k: v
        for k, v in os.environ.items()
        # scrub anything that would re-route the children to the TPU plugin
        # or confuse the coordinator (this image's sitecustomize registers
        # the axon PJRT plugin — touching the backend — whenever
        # PALLAS_AXON_POOL_IPS is set)
        if not k.startswith(("TPU_", "JAX_", "AXON_", "PALLAS_AXON_"))
    }
    procs = []
    for i in range(2):
        env = dict(
            env_base,
            COORD=coord,
            PROC_ID=str(i),
            CNMGP_REPO=REPO,
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process child timed out (coordinator hang?)")
        if p.returncode != 0:
            if "UNAVAILABLE" in stderr or "DEADLINE_EXCEEDED" in stderr:
                pytest.skip(f"coordinator port unavailable on this host: {stderr[-400:]}")
            pytest.fail(f"child failed rc={p.returncode}\n{stderr[-2000:]}")
        outs.append(stdout)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))

    assert {r["pid"] for r in results} == {0, 1}
    for r in results:
        assert r["pcount"] == 2
        assert r["ndev"] == 4
        assert r["mesh_shape"] == {"data": 4, "chain": 1}
        np.testing.assert_allclose(r["sum"], r["expected_sum"])

"""True multi-process ``jax.distributed`` execution on the CPU backend.

The reference's distributed tests require a manually started IPython
cluster and otherwise skip (tests/simulations_package_test.py:2705-2735);
here the multi-host path is exercised for real: two OS processes join via
``init_multihost`` (Gloo collectives), form one global 2x4 (host, chip)
mesh with ``make_host_chip_mesh``, run the sharded QPSK/AWGN Monte Carlo
chain, and the XLA ``psum``-reduced global error count must equal the
single-process result on the same keys (the framework's key schedule is
sharding-invariant).
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    pid, port = int(sys.argv[1]), sys.argv[2]

    from pyphysim_tpu.parallel import init_multihost, make_host_chip_mesh
    init_multihost(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from worker_chain import global_keys, step

    mesh = make_host_chip_mesh()  # num_hosts defaults to process_count()
    sh = NamedSharding(mesh, P("host", "chip"))
    keys = global_keys()
    arr = jax.make_array_from_callback(keys.shape, sh,
                                       lambda idx: keys[idx])
    total = jax.jit(
        lambda k: jnp.sum(jax.vmap(jax.vmap(step))(k)),
        out_shardings=NamedSharding(mesh, P()))(arr)
    print(f"TOTAL {pid} {int(total)}", flush=True)
""")

_CHAIN = textwrap.dedent("""
    import jax
    import jax.numpy as jnp
    import numpy as np


    def global_keys():
        keys = jax.random.split(jax.random.PRNGKey(7), 8)
        return np.asarray(keys).reshape(2, 4, 2)


    def step(key):
        from pyphysim_tpu.modulators import QPSK
        from pyphysim_tpu.utils.misc import count_bit_errors, randn_c
        mod = QPSK()
        n = 512
        k1, k2 = jax.random.split(jnp.asarray(key, jnp.uint32))
        data = jax.random.randint(k1, (n,), 0, 4)
        rx = mod.modulate(data) + randn_c(k2, n) * jnp.sqrt(0.2)
        return count_bit_errors(data, mod.demodulate(rx))
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class TestMultiProcessMesh:
    def test_two_process_psum_matches_single_process(self, tmp_path):
        (tmp_path / "worker.py").write_text(_WORKER)
        (tmp_path / "worker_chain.py").write_text(_CHAIN)

        port = _free_port()
        env = {"PYTHONPATH": f"{REPO}:{tmp_path}:/root/.axon_site"}
        import os
        env = {**os.environ, **env}
        procs = [subprocess.Popen(
            [sys.executable, str(tmp_path / "worker.py"), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(2)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(out)

        totals = {}
        for out in outs:
            for line in out.splitlines():
                if line.startswith("TOTAL"):
                    _, pid, tot = line.split()
                    totals[int(pid)] = int(tot)
        assert set(totals) == {0, 1}
        # both processes see the same fully-reduced global count
        assert totals[0] == totals[1]

        # single-process ground truth on the same global keys
        sys.path.insert(0, str(tmp_path))
        try:
            import worker_chain
            keys = jnp.asarray(worker_chain.global_keys().reshape(8, 2))
            expected = int(jnp.sum(jax.vmap(worker_chain.step)(keys)))
        finally:
            sys.path.remove(str(tmp_path))
            sys.modules.pop("worker_chain", None)
        assert totals[0] == expected
        assert expected > 0  # the chain actually made errors to count

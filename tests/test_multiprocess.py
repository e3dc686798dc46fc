"""Real >=2-process jax.distributed coverage (VERDICT round-3 Missing #4).

Spawns tools/multiproc_smoke.py: two OS processes x two virtual CPU devices,
cluster bring-up via init_multihost, global-mesh sharded render, per-process
local shards asserted bit-identical to a single-process render. This is the
`mpirun -np 2` analog for the reference's MPI handshake (mpi.hpp:189-203).
"""

import subprocess
import sys
from pathlib import Path


def test_two_process_distributed_render_bit_identical():
    tool = Path(__file__).resolve().parent.parent / "tools" / "multiproc_smoke.py"
    proc = subprocess.run([sys.executable, str(tool)], capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, (proc.stderr or proc.stdout)[-2000:]
    assert '"bit_identical_vs_single_process": true' in proc.stdout

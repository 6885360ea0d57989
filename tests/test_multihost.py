"""Multi-host (multi-process) readiness: two local CPU processes form a
DCN-style distributed JAX cluster, build a process-spanning (data, docs)
mesh, and run the production shard merge (all_gather + deterministic
sort-merge) across the process boundary.

Real multi-host TPU hardware is unavailable here; this validates the code
path the pod deployment uses (SURVEY.md §2.7 last row): jax.distributed
init, make_mesh_global, and merge_topk_across_docs inside shard_map.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from seismic_tpu.parallel.mesh import init_distributed, make_mesh_global
from seismic_tpu.parallel.sharded import merge_topk_across_docs

assert init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = make_mesh_global(n_docs_shards=4, n_data=1)
S, B, K = 4, 8, 5

def make_and_merge():
    # deterministic per-shard candidates created on-device
    def local(shard_idx):
        s = shard_idx[0, 0]
        base = (s.astype(jnp.float32) * 131.0) % 17.0
        scores = (
            base
            + jnp.arange(B, dtype=jnp.float32)[:, None] * 0.5
            + jnp.arange(K, dtype=jnp.float32)[None, :][:, ::-1]
        )
        gids = (
            s * 1000
            + jnp.arange(B, dtype=jnp.int32)[:, None] * 10
            + jnp.arange(K, dtype=jnp.int32)[None, :]
        )
        return merge_topk_across_docs(scores, gids)

    idx = jnp.arange(S, dtype=jnp.int32).reshape(S, 1)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("docs", None),),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)(idx)

scores, ids = make_and_merge()
scores, ids = np.asarray(scores), np.asarray(ids)

# numpy oracle over all shards
exp_s = np.zeros((4, B, K), np.float32)
exp_i = np.zeros((4, B, K), np.int64)
for s in range(4):
    base = (s * 131.0) % 17.0
    exp_s[s] = (
        base
        + np.arange(B, dtype=np.float32)[:, None] * 0.5
        + np.arange(K, dtype=np.float32)[None, ::-1]
    )
    exp_i[s] = s * 1000 + np.arange(B)[:, None] * 10 + np.arange(K)[None, :]
flat_s = exp_s.transpose(1, 0, 2).reshape(B, 4 * K)
flat_i = exp_i.transpose(1, 0, 2).reshape(B, 4 * K)
for b in range(B):
    order = np.lexsort((flat_i[b], -flat_s[b]))[:K]
    assert np.allclose(scores[b], flat_s[b][order]), (b, scores[b])
    assert np.array_equal(ids[b], flat_i[b][order]), (b, ids[b])
print(f"proc {pid}: multihost merge ok over {jax.process_count()} processes")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_merge(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = os.path.join(os.path.dirname(__file__), "..")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "distributed" in out and "not" in out.lower()
        ):
            pytest.skip(f"jax.distributed unavailable on CPU: {out[-400:]}")
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "multihost merge ok" in out

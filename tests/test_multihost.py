"""True multi-process mesh test: the sharded search path across a REAL
process boundary.

CI's other multi-chip tests run on one process's 8 virtual CPU devices —
collectives never leave the process. This test launches TWO separate
Python processes (4 CPU devices each), joins them with
jax.distributed.initialize (Gloo cross-process collectives — the CPU
stand-in for a pod's ICI/DCN), row-shards the corpus over the global
8-device mesh, and asserts both processes' all_gather-merged top-k
equals the single-device oracle. This is the program shape a TPU pod
runs per host; nothing in SearchEngine special-cases the multi-process
topology.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_sharded_search_across_process_boundary(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    outs = [tmp_path / f"proc{i}.json" for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc), str(port), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process mesh worker hung (300s)")
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            if "jax.distributed" in log and "initialize" in log and (
                "not available" in log or "Unimplemented" in log
            ):
                pytest.skip(f"jax.distributed unavailable here: {log[-300:]}")
            pytest.fail(f"worker rc={p.returncode}\n{log[-2000:]}")

    results = [json.loads(o.read_text()) for o in outs]
    for r in results:
        assert r["n_global_devices"] == 4 * nproc
        assert r["sharded_speed_ok"], "speed path must be active on the global mesh"
    # the all_gather merge is replicated: every process sees the same ids
    assert results[0]["ids"] == results[1]["ids"]
    # dp+tp training: loss is replicated across the process boundary,
    # finite, and decreasing
    l0, l1 = results[0]["train_losses"], results[1]["train_losses"]
    assert l0 == l1, (l0, l1)
    assert all(np.isfinite(l0)) and l0[-1] < l0[0], l0
    # data-parallel encode over the global mesh == single-device encode
    for r in results:
        assert r["encode_min_cos"] > 0.999, r["encode_min_cos"]

    # single-device oracle (same deterministic corpus as the workers)
    rng = np.random.default_rng(0)
    n, d = 4096, 64
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = vecs[:8] + 0.01 * rng.standard_normal((8, d), dtype=np.float32)

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    idx = FlatIndex.build(
        vecs, ids=np.arange(n),
        config=IndexConfig(dtype="int8", int8_scale="global"),
    )
    eng = SearchEngine(
        idx, use_pallas=True, pallas_interpret=True, row_block=128,
        rescore_vectors=vecs, rescore_factor=8,
    )
    _, ref_ids = eng.search_vectors(queries, k=10)
    assert results[0]["ids"] == np.asarray(ref_ids).tolist()

    # live updates across the process boundary: both processes applied
    # the identical mutation stream and must agree with each other AND
    # with the single-device live engine, through compact(reclaim)
    assert results[0]["live_ids"] == results[1]["live_ids"]
    assert results[0]["post_reclaim_ids"] == results[1]["post_reclaim_ids"]
    assert results[0]["folded"] == results[1]["folded"]
    rng_m = np.random.default_rng(1)
    new = rng_m.standard_normal((6, d), dtype=np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    ids_new = eng.add_documents(new[:5], normalize=False)
    eng.update_document(17, new[5])
    assert eng.delete_documents([9, int(ids_new[0])]) == 2
    _, i_live = eng.search_vectors(queries, k=10)
    folded = eng.compact(reclaim=True)
    _, i_post = eng.search_vectors(queries, k=10)
    assert results[0]["live_ids"] == np.asarray(i_live).tolist()
    assert results[0]["post_reclaim_ids"] == np.asarray(i_post).tolist()
    assert results[0]["folded"] == folded
    assert results[0]["num_live"] == eng.num_live

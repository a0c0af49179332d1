"""Worker for tests/test_multihost.py — one PROCESS of a multi-process
(multi-host-shaped) search deployment.

Run as: python tests/multihost_worker.py <proc_id> <n_procs> <port> <out.json>

Each process owns 4 CPU devices; jax.distributed.initialize() joins them
into one global 8-device mesh with Gloo cross-process collectives — the
same program shape a TPU pod runs per host over ICI/DCN (there
jax.distributed.initialize() discovers the topology instead of taking
explicit ids). The corpus is row-sharded over the GLOBAL mesh: each
process places only its addressable shards (jax.device_put with a
process-spanning NamedSharding), and the engine's all_gather merge
crosses the process boundary. Every process must end up with the same
top-k — the merge is replicated — which the parent test asserts against
a single-device oracle.

Mirrors the reference's scale-out unit (one Postgres, many clients,
streamlit_app.py:275-281) with the TPU-native inversion: the corpus is
the thing that shards; queries replicate.
"""

import json
import sys


def main() -> None:
    proc, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=proc
    )

    import numpy as np
    from jax.sharding import Mesh

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    # deterministic corpus: every process builds the identical index
    # (on a real pod the hosts would load the same manifest shards)
    rng = np.random.default_rng(0)
    n, d = 4096, 64
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = vecs[:8] + 0.01 * rng.standard_normal((8, d), dtype=np.float32)

    mesh = Mesh(np.array(jax.devices()), ("shard",))
    assert len(jax.devices()) == 4 * nproc, "global mesh spans all processes"
    assert len(jax.local_devices()) == 4

    idx = FlatIndex.build(
        vecs, ids=np.arange(n),
        config=IndexConfig(dtype="int8", int8_scale="global"),
    )
    eng = SearchEngine(
        idx, mesh=mesh, use_pallas=True, pallas_interpret=True, row_block=128,
        rescore_vectors=vecs, rescore_factor=8,
    )
    scores, ids = eng.search_vectors(queries, k=10)

    # ---- live updates across the process boundary: every process
    # applies the IDENTICAL mutation stream (a real deployment
    # replicates its mutation log to all hosts); the replicated delta
    # scan, the row-sharded tombstone mask, and the compact(reclaim)
    # rebuild+swap all run SPMD over the global mesh.
    rng_m = np.random.default_rng(1)
    new = rng_m.standard_normal((6, d), dtype=np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    ids_new = eng.add_documents(new[:5], normalize=False)
    eng.update_document(17, new[5])
    assert eng.delete_documents([9, int(ids_new[0])]) == 2
    s_live, i_live = eng.search_vectors(queries, k=10)
    folded = eng.compact(reclaim=True)
    s_post, i_post = eng.search_vectors(queries, k=10)

    # ---- dp+tp training across the process boundary: the global mesh
    # splits (data=2, shard=4), so gradient psums cross the Gloo
    # boundary; the same train step code runs unchanged.
    from theoremsearch_tpu.core import EncoderConfig, MeshConfig, make_mesh
    from theoremsearch_tpu.core.config import TrainConfig
    from theoremsearch_tpu.encoder.tokenizer import SimpleTokenizer
    from theoremsearch_tpu.train import init_sharded_train_state, make_train_step

    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig(batch_size=8, seq_len=16, learning_rate=3e-3)
    mesh2 = make_mesh(MeshConfig(data=2, shard=4))
    state = init_sharded_train_state(cfg, tcfg, mesh2)
    step = make_train_step(cfg, tcfg, mesh=mesh2)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    qe = tok([f"query topic {i}" for i in range(8)], pad_to=16)
    pe = tok([f"statement topic {i}" for i in range(8)], pad_to=16)
    batch = (
        np.asarray(qe.input_ids), np.asarray(qe.attention_mask),
        np.asarray(pe.input_ids), np.asarray(pe.attention_mask),
    )
    losses = []
    for _ in range(3):
        state, loss = step(state, *batch)
        losses.append(round(float(loss), 6))

    # ---- data-parallel batched encode over the same global mesh vs the
    # process-local single-device encoder: identical embeddings
    from theoremsearch_tpu.encoder.batching import BatchedEncoder
    from theoremsearch_tpu.encoder.model import init_params

    params = init_params(cfg, __import__("jax").random.PRNGKey(0))
    be_mesh = BatchedEncoder(
        params, cfg, batch_size=8, buckets=(16,), mesh=mesh2
    )
    be_one = BatchedEncoder(params, cfg, batch_size=8, buckets=(16,))
    texts = [f"multi host encode check {i}" for i in range(8)]
    e_mesh = np.asarray(be_mesh.encode(texts))
    e_one = np.asarray(be_one.encode(texts))
    enc_cos = float(np.min(np.sum(e_mesh * e_one, axis=1)))

    with open(out_path, "w") as f:
        json.dump(
            {
                "proc": proc,
                "n_global_devices": len(jax.devices()),
                "sharded_speed_ok": bool(eng._sharded_speed_ok),
                "ids": np.asarray(ids).tolist(),
                "scores": np.asarray(scores, np.float64).round(5).tolist(),
                "live_ids": np.asarray(i_live).tolist(),
                "post_reclaim_ids": np.asarray(i_post).tolist(),
                "folded": int(folded),
                "num_live": int(eng.num_live),
                "train_losses": losses,
                "encode_min_cos": round(enc_cos, 6),
            },
            f,
        )


if __name__ == "__main__":
    main()

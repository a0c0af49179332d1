"""theoremsearch_tpu — a TPU-native theorem search framework.

A from-scratch rebuild of the capabilities of uw-math-ai/TheoremSearch
(reference mounted read-only at /root/reference), designed TPU-first:

- the sentence-transformers/PyTorch embedding path
  (reference: ec2/generate_embeddings/embeddings.py) becomes a batched
  JAX/XLA encoder under a data-parallel mesh (`theoremsearch_tpu.encoder`);
- the pgvector `<#>` full-table scan (reference: streamlit_app.py:281)
  becomes a sharded HBM-resident embedding matrix queried by a fused
  Pallas matmul+top-k kernel (`theoremsearch_tpu.kernels.mips`);
- Postgres-as-coordination-plane becomes a local catalog + shard manifests
  with checkpoint/resume (`theoremsearch_tpu.index`, `theoremsearch_tpu.ingest.catalog`);
- the IR evaluation harness (reference: compare_embeddings.py) is ported
  with an exact brute-force oracle and a recall@k gate (`theoremsearch_tpu.eval`).
"""

__version__ = "0.1.0"

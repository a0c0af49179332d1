"""Batched, padding-bucketed, data-parallel encoder inference.

Replaces the reference's embed_texts (ec2/generate_embeddings/
embeddings.py:16-40: SentenceTransformer.encode / encode_multi_process
with normalize_embeddings=True). TPU version:

- texts are bucketed by token length into a few static padded widths so
  XLA compiles one program per (batch, width) pair instead of per shape;
- batches run under jit with inputs sharded over the mesh 'data' axis —
  the idiomatic replacement for encode_multi_process's process pool;
- results are re-ordered to input order and returned L2-normalized fp32.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderConfig
from .model import Params, encode_pooled
from .tokenizer import SimpleTokenizer

DEFAULT_BUCKETS = (64, 128, 256, 512)


class BatchedEncoder:
    def __init__(
        self,
        params: Params,
        cfg: EncoderConfig,
        tokenizer=None,
        mesh: Mesh | None = None,
        batch_size: int = 64,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(vocab_size=cfg.vocab_size)
        self.mesh = mesh
        self.batch_size = batch_size
        self.buckets = tuple(b for b in buckets if b <= cfg.max_seq_len) or (cfg.max_seq_len,)
        # fused Pallas attention on a real single-chip backend; the XLA
        # reference path on CPU and under a mesh (pallas_call is opaque
        # to the GSPMD partitioner, so sharded inputs keep the XLA path)
        fused = "on" if (mesh is None and jax.default_backend() != "cpu") else "off"
        self._fn = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused=fused))
        if mesh is not None:
            self._data_sharding = NamedSharding(mesh, P("data", None))
        else:
            self._data_sharding = None

    def _bucket_for(self, n_tokens: int) -> int:
        for b in self.buckets:
            if n_tokens <= b:
                return b
        return self.buckets[-1]

    def encode_long(self, texts: Sequence[str], chunk_tokens: int | None = None) -> np.ndarray:
        """Long-document encoding: blockwise encode + mean-pool.

        The reference avoids long inputs entirely (theorems are compressed
        to <=4-sentence slogans; SURVEY.md §5 notes blockwise
        encode+mean-pool as the idiomatic extension). Documents longer
        than the max bucket are split into token chunks, each chunk
        encoded normally, and the normalized chunk embeddings mean-pooled
        and re-normalized."""
        chunk_tokens = chunk_tokens or (self.buckets[-1] - 2)
        pieces: list[str] = []
        owners: list[int] = []
        for i, t in enumerate(texts):
            toks = self.tokenizer.tokenize(t)
            if len(toks) <= chunk_tokens:
                pieces.append(t)
                owners.append(i)
                continue
            words = t.split()
            # split by words proportionally to the token count
            n_chunks = (len(toks) + chunk_tokens - 1) // chunk_tokens
            per = max(1, len(words) // n_chunks)
            for s in range(0, len(words), per):
                pieces.append(" ".join(words[s : s + per]))
                owners.append(i)
        emb = self.encode(pieces)
        out = np.zeros((len(texts), self.cfg.embedding_dim), np.float32)
        counts = np.zeros(len(texts))
        for j, owner in enumerate(owners):
            out[owner] += emb[j]
            counts[owner] += 1
        out /= np.maximum(counts[:, None], 1)
        if self.cfg.normalize:
            out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out

    def encode_device(self, texts: Sequence[str]) -> "jax.Array":
        """Like encode(), but the result STAYS ON DEVICE (no host sync):
        feeds SearchEngine.search_vectors_async directly so the serving
        pipeline syncs once per batch, at the results.

        Returns (n_pad, D) where n_pad is len(texts) padded UP to a power
        of two — rows beyond len(texts) are junk (empty-string
        embeddings). Every device shape here (forward, scatter, output)
        is bucketed: dynamic serving batch sizes therefore reuse a
        BOUNDED set of compiled programs. The first un-bucketed version
        compiled a fresh scatter program per raw batch size — each one a
        multi-second remote compile that stalled the serving pipeline."""
        if not len(texts):
            return jnp.zeros((0, self.cfg.embedding_dim), jnp.float32)
        n = len(texts)
        n_pad = 8
        while n_pad < n:
            n_pad *= 2
        texts = list(texts) + [""] * (n_pad - n)
        tokenized = [self.tokenizer.tokenize(t) for t in texts]
        bs = self.batch_size
        # single sub-batch: every row pads to the longest row's bucket
        # regardless of order, so sorting buys nothing and its scatter
        # re-ordering costs an extra device op per serving batch
        if n_pad <= bs:
            order = list(range(n_pad))
        else:
            order = sorted(range(n_pad), key=lambda i: len(tokenized[i]))
        pieces = []
        for start in range(0, len(order), bs):
            idx = order[start : start + bs]
            ids_d, mask_d, n_real = self._prep_batch(texts, tokenized, idx)
            pieces.append((idx, self._fn(self.params, ids_d, mask_d)[:n_real]))
        if len(pieces) == 1 and pieces[0][0] == list(range(n_pad)):
            return pieces[0][1].astype(jnp.float32)
        out = jnp.zeros((n_pad, self.cfg.embedding_dim), jnp.float32)
        for idx, emb in pieces:
            out = out.at[jnp.asarray(idx, jnp.int32)].set(emb.astype(jnp.float32))
        return out

    def _prep_batch(self, texts, tokenized, idx):
        """Tokenize+pad one sub-batch to its (batch-bucket, width-bucket)
        static shape; returns (ids, mask, n_real) device arrays."""
        longest = max(len(tokenized[i]) for i in idx) + 2  # BOS/EOS
        width = self._bucket_for(longest)
        if isinstance(self.tokenizer, SimpleTokenizer):
            # build arrays from the ALREADY-tokenized lists — calling the
            # tokenizer again would re-run regex+hash per text (measured
            # as a visible share of the serving encoder stage)
            tk = self.tokenizer
            ids = np.full((len(idx), width), tk.pad_id, np.int32)
            mask = np.zeros((len(idx), width), np.int32)
            for j, i in enumerate(idx):
                s = [tk.bos_id] + tokenized[i][: width - 2] + [tk.eos_id]
                ids[j, : len(s)] = s
                mask[j, : len(s)] = 1
        else:
            chunk = [texts[i] for i in idx]
            enc = self.tokenizer(chunk, max_length=width, pad_to=width)
            ids, mask = enc.input_ids, enc.attention_mask
        b_pad = 8
        while b_pad < len(idx):
            b_pad *= 2
        b_pad = min(b_pad, self.batch_size)
        if self._data_sharding is not None:
            # P('data', None) inputs need the batch dim divisible by the
            # data axis; round the bucket up (pow2 buckets already cover
            # pow2 axes <= 8, but not larger or non-pow2 data axes)
            axis = self.mesh.shape["data"]
            b_pad = ((max(b_pad, len(idx)) + axis - 1) // axis) * axis
        if len(idx) < b_pad:
            pad = b_pad - len(idx)
            ids = np.concatenate([ids, np.zeros((pad, width), np.int32)])
            mask = np.concatenate([mask, np.zeros((pad, width), np.int32)])
            mask[len(idx):, 0] = 1  # avoid fully-empty rows
        ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
        if self._data_sharding is not None:
            ids_d = jax.device_put(ids_d, self._data_sharding)
            mask_d = jax.device_put(mask_d, self._data_sharding)
        return ids_d, mask_d, len(idx)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """(len(texts), embedding_dim) fp32, normalized per config."""
        if not len(texts):
            return np.zeros((0, self.cfg.embedding_dim), np.float32)
        tokenized = [self.tokenizer.tokenize(t) for t in texts]
        if len(texts) <= self.batch_size:
            order = list(range(len(texts)))
        else:
            order = sorted(range(len(texts)), key=lambda i: len(tokenized[i]))
        out = np.zeros((len(texts), self.cfg.embedding_dim), np.float32)

        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start : start + bs]
            # sub-batches pad to their power-of-two bucket (_prep_batch):
            # small serving batches get small forwards, and dynamic sizes
            # compile at most log2(bs) programs per width bucket
            ids_d, mask_d, n_real = self._prep_batch(texts, tokenized, idx)
            emb = np.asarray(self._fn(self.params, ids_d, mask_d))
            out[idx] = emb[:n_real]
        return out

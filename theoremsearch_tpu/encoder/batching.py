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
from ..utils.shapes import pow2_bucket
from .model import Params
from .tokenizer import SimpleTokenizer

DEFAULT_BUCKETS = (64, 128, 256, 512)
# backends where the fused Mosaic kernel cannot lower (Pallas TPU-only;
# the axon-tunnelled TPU reports a non-"tpu" platform name, so gate by
# exclusion rather than == "tpu")
_NO_FUSED_BACKENDS = ("cpu", "gpu", "cuda", "rocm")


class BatchedEncoder:
    def __init__(
        self,
        params: Params,
        cfg: EncoderConfig,
        tokenizer=None,
        mesh: Mesh | None = None,
        batch_size: int = 64,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        prompts: dict | None = None,
        quant: str = "none",
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(vocab_size=cfg.vocab_size)
        # sentence-transformers role prompts (config_sentence_transformers
        # .json "prompts": e.g. embeddinggemma's "task: search result |
        # query: " / "title: none | text: "; the qwen instruct template).
        # Applied as text prefixes when encode(..., role=...) names one.
        self.prompts = dict(prompts or {})
        self.mesh = mesh
        self.batch_size = batch_size
        self.buckets = tuple(
            sorted(b for b in buckets if b <= cfg.max_seq_len)
        ) or (cfg.max_seq_len,)
        # fused Pallas attention on a real single-chip TPU backend; the
        # XLA reference path on CPU/GPU and under a mesh (pallas_call is
        # opaque to the GSPMD partitioner, so sharded inputs keep XLA)
        fused = (
            "on"
            if (mesh is None and jax.default_backend() not in _NO_FUSED_BACKENDS)
            else "off"
        )
        # model family dispatch on the config type: the gemma and bert
        # towers (the reference's other two embedders) share this whole
        # batching/bucketing layer
        from .families import family_module

        mod = family_module(cfg)
        # on a multi-process (multi-host) mesh the dp-sharded output
        # spans non-addressable devices, so np.asarray on it fails —
        # replicate the (B, D) output via out_shardings (XLA inserts the
        # all_gather on the wire; the embedding block is tiny). A
        # single-process mesh keeps the sharded output: host fetch works
        # per-shard and encode_device feeds the scan without a gather.
        jit_kwargs: dict = {}
        if mesh is not None and len(
            {d.process_index for d in mesh.devices.flat}
        ) > 1:
            jit_kwargs["out_shardings"] = NamedSharding(mesh, P())
        # ids and mask travel as ONE stacked (2, B, W) array: each
        # host->device transfer over the axon tunnel costs ~18 ms of
        # round-trip latency regardless of size (64 KB measured 37 ms as
        # two transfers, experiments/exp_enc_stage.py), so halving the
        # transfer count is a direct stage win
        # int8 (w8a8) serving mode: all projection matmuls on the int8
        # MXU path (model.py quantization section; 1.21x measured
        # forward). Qwen/gemma families; single chip or a pure-dp mesh
        # (replicated weights) — the bert tower (biased projections) and
        # the tp sharding rules have no int8 variant.
        if quant not in ("none", "int8"):
            raise ValueError(f"unknown quant mode {quant!r}")
        self._fn_extra: dict = {}
        pooled_kw: dict = {}
        if quant == "int8":
            if not hasattr(mod, "quantize_params_int8"):
                raise ValueError(
                    f"quant='int8' is not supported for the "
                    f"{type(cfg).__name__} family"
                )
            if mesh is not None and mesh.shape.get("shard", 1) > 1:
                raise ValueError(
                    "quant='int8' supports single-chip or dp-only meshes "
                    "(no tp sharding rules for the int8 weights)"
                )
            self._fn_extra["qlayers"] = jax.jit(mod.quantize_params_int8)(params)
            if fused == "on" and hasattr(mod, "_fused_layer_ok"):
                # whole-layer fused int8 kernels (kernels/layer_int8.py)
                # when the per-batch shapes qualify — forward() falls
                # back to the op-chain otherwise
                pooled_kw["fused_layers"] = True
        pooled = functools.partial(
            mod.encode_pooled, cfg=cfg, fused=fused, **pooled_kw
        )

        def _stacked(params, ids_mask, **kw):
            return pooled(params, ids_mask[0], ids_mask[1], **kw)

        self._fn = jax.jit(_stacked, **jit_kwargs)
        if mesh is not None:
            # leading axis 2 is the stacked ids/mask pair; batch is axis 1
            self._data_sharding = NamedSharding(mesh, P(None, "data", None))
        else:
            self._data_sharding = None

    def _bucket_for(self, n_tokens: int) -> int:
        for b in self.buckets:
            if n_tokens <= b:
                return b
        return self.buckets[-1]

    def encode_long(
        self,
        texts: Sequence[str],
        chunk_tokens: int | None = None,
        role: str | None = None,
    ) -> np.ndarray:
        """Long-document encoding: blockwise encode + mean-pool.

        The reference avoids long inputs entirely (theorems are compressed
        to <=4-sentence slogans; SURVEY.md §5 notes blockwise
        encode+mean-pool as the idiomatic extension). Documents longer
        than the max bucket are split into token chunks, each chunk
        encoded normally, and the normalized chunk embeddings mean-pooled
        and re-normalized."""
        chunk_tokens = chunk_tokens or (self.buckets[-1] - 2)
        # role prompt applies to the document ONCE, before chunking (the
        # prefix lands in the first chunk — matching sentence-transformers,
        # which prompts the full text and then truncates)
        texts = self._apply_prompt(texts, role)
        pieces: list[str] = []
        owners: list[int] = []
        for i, t in enumerate(texts):
            toks = self.tokenizer.tokenize(t)
            if len(toks) <= chunk_tokens:
                pieces.append(t)
                owners.append(i)
                continue
            # greedy accumulation by each word's ACTUAL token count —
            # a proportional word split under-counts token-dense math
            # text (one \frac{...}{...} "word" is many tokens) and the
            # oversized chunk would silently truncate in _prep_batch
            words = t.split() or [t]
            cur: list[str] = []
            cur_tokens = 0
            for w in words:
                wt = len(self.tokenizer.tokenize(w))
                if cur and cur_tokens + wt > chunk_tokens:
                    pieces.append(" ".join(cur))
                    owners.append(i)
                    cur, cur_tokens = [], 0
                cur.append(w)
                cur_tokens += wt
            if cur:
                pieces.append(" ".join(cur))
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

    def _apply_prompt(self, texts: Sequence[str], role: str | None) -> list:
        pre = self.prompts.get(role) if role else None
        return [pre + t for t in texts] if pre else list(texts)

    def for_role(self, role: str):
        """encode() closure with a fixed role — the plumbing-friendly
        form for pipeline (documents) and serving (queries) call sites
        that take a bare Callable[[list[str]], ndarray]."""
        return functools.partial(self.encode, role=role)

    def encode_device(self, texts: Sequence[str], role: str | None = None) -> "jax.Array":
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
        n_pad = pow2_bucket(n)
        texts = self._apply_prompt(texts, role) + [""] * (n_pad - n)
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
            ids_mask, n_real = self._prep_batch(texts, tokenized, idx)
            pieces.append(
                (idx, self._fn(self.params, ids_mask, **self._fn_extra)[:n_real])
            )
        if n_pad <= bs:   # single piece in input order, no scatter needed
            return pieces[0][1].astype(jnp.float32)
        out = jnp.zeros((n_pad, self.cfg.embedding_dim), jnp.float32)
        for idx, emb in pieces:
            out = out.at[jnp.asarray(idx, jnp.int32)].set(emb.astype(jnp.float32))
        return out

    def _prep_batch(self, texts, tokenized, idx):
        """Pad one sub-batch to its (batch-bucket, width-bucket) static
        shape; returns (ids_mask, n_real) where ids_mask is ONE stacked
        (2, B, W) device array (ids at [0], attention mask at [1] — one
        h2d transfer instead of two)."""
        longest = max(len(tokenized[i]) for i in idx) + 2  # specials
        width = self._bucket_for(longest)
        # assemble from the ALREADY-tokenized lists — re-running the
        # tokenizer measured as a visible share of the serving encoder
        # stage (both the hash tokenizer and the HF one)
        if hasattr(self.tokenizer, "encode_pretokenized"):
            enc = self.tokenizer.encode_pretokenized(
                [tokenized[i] for i in idx], pad_to=width
            )
        else:   # duck-typed custom tokenizer: fall back to re-encoding
            enc = self.tokenizer(
                [texts[i] for i in idx], max_length=width, pad_to=width
            )
        ids, mask = enc.input_ids, enc.attention_mask
        b_pad = min(pow2_bucket(len(idx)), self.batch_size)
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
        stacked = np.stack([ids, mask])  # one h2d transfer, not two
        if self._data_sharding is not None:
            ids_mask = jax.device_put(stacked, self._data_sharding)
        else:
            ids_mask = jnp.asarray(stacked)
        return ids_mask, len(idx)

    def encode(self, texts: Sequence[str], role: str | None = None) -> np.ndarray:
        """(len(texts), embedding_dim) fp32, normalized per config.
        `role` selects a sentence-transformers prompt prefix ("query" /
        "document") when the checkpoint ships one."""
        if not len(texts):
            return np.zeros((0, self.cfg.embedding_dim), np.float32)
        texts = self._apply_prompt(texts, role)
        tokenized = [self.tokenizer.tokenize(t) for t in texts]
        if len(texts) <= self.batch_size:
            order = list(range(len(texts)))
        else:
            order = sorted(range(len(texts)), key=lambda i: len(tokenized[i]))
        out = np.zeros((len(texts), self.cfg.embedding_dim), np.float32)

        bs = self.batch_size
        # software pipeline, two stages deep:
        #  - a prefetch thread runs _prep_batch (pad + h2d transfer) for
        #    sub-batch i+1 while the device computes sub-batch i — over
        #    the axon tunnel the transfer alone is ~18 ms/batch of
        #    latency that would otherwise serialize between forwards;
        #  - the dispatch loop launches sub-batch i+1's forward BEFORE
        #    pulling i's result, so the device never idles during the
        #    device->host pull. Together: 2.5k -> ~5k q/s at batch 512
        #    (experiments/exp_enc_stage.py).
        sub = [order[s : s + bs] for s in range(0, len(order), bs)]
        # sub-batches pad to their power-of-two bucket (_prep_batch):
        # small serving batches get small forwards, and dynamic sizes
        # compile at most log2(bs) programs per width bucket
        if len(sub) == 1:
            idx = sub[0]
            ids_mask, n_real = self._prep_batch(texts, tokenized, idx)
            emb_d = self._fn(self.params, ids_mask, **self._fn_extra)
            out[idx] = np.asarray(emb_d)[:n_real]
            return out

        import queue as _queue
        import threading as _threading

        prepped: _queue.Queue = _queue.Queue(maxsize=2)
        stop = _threading.Event()   # set if the consumer dies: unblocks
        # a producer waiting on the bounded queue so join() can't hang

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    prepped.put(item, timeout=0.1)
                    return True
                except _queue.Full:
                    continue
            return False

        def _producer():
            try:
                for idx in sub:
                    ids_mask, n_real = self._prep_batch(texts, tokenized, idx)
                    if not _put((idx, ids_mask, n_real)):
                        return
            except BaseException as e:  # noqa: BLE001 - relayed to consumer
                _put(e)
            else:
                _put(None)

        t = _threading.Thread(target=_producer, daemon=True)
        t.start()
        pending: tuple | None = None
        try:
            while True:
                item = prepped.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                idx, ids_mask, n_real = item
                emb_d = self._fn(self.params, ids_mask, **self._fn_extra)
                if pending is not None:
                    p_idx, p_n, p_emb = pending
                    out[p_idx] = np.asarray(p_emb)[:p_n]
                pending = (idx, n_real, emb_d)
        finally:
            stop.set()
            t.join()
        if pending is not None:
            p_idx, p_n, p_emb = pending
            out[p_idx] = np.asarray(p_emb)[:p_n]
        return out

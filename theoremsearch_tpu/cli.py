"""Unified CLI.

One entrypoint with subcommands covering the reference's per-module CLIs
(python -m ec2.upsert_arxiv / locate_arxiv_in_s3 / parse_arxiv_papers /
upsert_stacks / generate_slogans / generate_embeddings, plus the eval and
quality probes and a search REPL):

    python -m theoremsearch_tpu ingest-arxiv --categories math.AG --date-partition month
    python -m theoremsearch_tpu locate-s3 --bundle-start 0
    python -m theoremsearch_tpu parse --timeout 30 --limit 100
    python -m theoremsearch_tpu stacks --parsed stacks_parsed.zip --tags tags
    python -m theoremsearch_tpu slogans --model offline-stub --prompt-id body-only-v1
    python -m theoremsearch_tpu embed --embedder qwen --spool ./spool
    python -m theoremsearch_tpu search "chromatic number bound" --top-k 5
    python -m theoremsearch_tpu eval            # vendored data/validation_set.csv
    python -m theoremsearch_tpu quality --sample 20
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _pkg_root() -> Path:
    """Repo root (parent of the package dir) — locates vendored data/."""
    return Path(__file__).resolve().parent.parent


def _catalog(args):
    from .ingest.catalog import Catalog

    return Catalog(args.catalog)


def _batched_encoder(args):
    """Checkpoint encoder when --model-dir is given (family auto-detected
    from config.json: qwen, gemma or bert — the reference's three
    embedders, ec2/generate_embeddings/embedders.py:1-4 +
    compare_embeddings.py:429-470), hermetic otherwise (family from
    --embedder)."""
    from .core.config import BertEncoderConfig, EncoderConfig, GemmaEncoderConfig
    from .encoder.batching import BatchedEncoder
    from .encoder.tokenizer import get_tokenizer
    import jax

    model_dir = getattr(args, "model_dir", None)
    if model_dir:
        from .encoder.loader import (
            detect_family,
            load_hf_bert_checkpoint,
            load_hf_checkpoint,
            load_hf_gemma_checkpoint,
        )

        family = detect_family(model_dir)
        if family == "gemma":
            params, cfg = load_hf_gemma_checkpoint(model_dir)
        elif family == "bert":
            params, cfg = load_hf_bert_checkpoint(model_dir)
        else:
            params, cfg = load_hf_checkpoint(model_dir)
        tok = get_tokenizer(model_dir, cfg.vocab_size)
        from .encoder.loader import load_st_prompts

        prompts = load_st_prompts(model_dir)
    else:
        family = getattr(args, "embedder", "qwen")
        if family == "gemma":
            from .encoder.gemma import init_params

            cfg = GemmaEncoderConfig.tiny()
        elif family == "bert":
            from .encoder.bert import init_params

            cfg = BertEncoderConfig.tiny()
        else:
            from .encoder.model import init_params

            cfg = EncoderConfig.tiny()
        params = init_params(cfg, jax.random.PRNGKey(0))
        tok = get_tokenizer(None, cfg.vocab_size)
        prompts = {}
    return BatchedEncoder(
        params, cfg, tokenizer=tok, prompts=prompts,
        quant=getattr(args, "quant", "none"),
    )


def _encoder(args, role: str | None = None):
    be = _batched_encoder(args)
    return be.for_role(role) if role else be.encode


def cmd_ingest_arxiv(args):
    from .ingest.arxiv_api import MATH_CATEGORIES, upsert_arxiv
    from .ingest.citations import get_paper_citations

    cats = args.categories or MATH_CATEGORIES
    n = upsert_arxiv(
        _catalog(args),
        categories=cats,
        date_partition=args.date_partition,
        citation_lookup=get_paper_citations if args.citations else None,
    )
    print(f"upserted {n} papers")


def cmd_locate_s3(args):
    from .ingest.sources import locate_in_bundles, s3_bundle_iterator

    cat = _catalog(args)
    for key, n in locate_in_bundles(cat, s3_bundle_iterator(args.bundle_start)):
        print(f"{key}: located {n}")


def cmd_parse(args):
    from .ingest.parse_driver import parse_papers

    stats = parse_papers(
        _catalog(args),
        timeout_s=args.timeout,
        limit=args.limit,
        parsing_method=args.parsing_method,
        debug=args.debugging_mode,
        verbose=True,
    )
    print(
        f"parsed={stats.parsed} failed={stats.failed} timeouts={stats.timeouts}"
        f" theorems={stats.theorems} rate={stats.parse_rate:.2%}"
    )


def cmd_stacks(args):
    from .ingest.stacks import load_tag_map, upsert_stacks_from_json

    tag_map = load_tag_map(args.tags) if args.tags else {}
    n = upsert_stacks_from_json(_catalog(args), args.parsed, tag_map)
    print(f"ingested {n} stacks theorems")


def cmd_slogans(args):
    from .slogans import generate_slogans, get_client, load_prompt
    from .utils.tracing import get_tracer

    prompt = load_prompt(args.prompt_id, prompts_dir=args.prompts_dir)
    client = get_client(args.model)
    tracer = get_tracer("jsonl", args.trace) if args.trace else None
    cost = generate_slogans(
        _catalog(args), prompt, client, model_name=args.model,
        workers=args.workers, limit=args.limit, tracer=tracer,
    )
    print(json.dumps(cost.summary()))


def cmd_embed(args):
    from .index.builder import IndexBuilder
    from .pipeline import embed_missing_slogans

    cfg = None
    if getattr(args, "index_dtype", None):
        from .core.config import IndexConfig

        cfg = {
            "bfloat16": IndexConfig(dtype="bfloat16"),
            "int8": IndexConfig(dtype="int8"),
            "int8-global": IndexConfig(dtype="int8", int8_scale="global"),
            "int8-global-residual": IndexConfig(
                dtype="int8", int8_scale="global", residual=True
            ),
        }[args.index_dtype]
    n = embed_missing_slogans(
        _catalog(args), _encoder(args, role="document"),
        IndexBuilder(args.spool, cfg),
        embedder=args.embedder, limit=args.limit,
    )
    print(f"embedded {n} slogans")


def cmd_build_ivf(args):
    """Pack the embedding spool into an IVF index (checkpointed build:
    k-means rounds + assignment persist in the spool dir, so a killed
    build resumes past the device-heavy stages), optionally
    auto-calibrating nprobe against the recall gate."""
    from .core.config import IndexConfig
    from .index.builder import IndexBuilder

    b = IndexBuilder(args.spool)
    cfg = b.config
    if args.nlist:
        cfg = cfg.replace(ivf_nlist=args.nlist)
    if cfg.ivf_nlist <= 0:
        cfg = cfg.replace(ivf_nlist=max(1, b.total_rows // 256))
    b.config = cfg.replace(
        dtype="int8", int8_scale="global",
        residual=bool(getattr(args, "residual", False) or cfg.residual),
    )
    index, calib = b.finalize_ivf(
        calibrate_gate=args.calibrate_gate if args.calibrate else None,
    )
    index.save(args.out)
    msg = f"IVF index: {index.num_rows} rows, {index.slabs.shape[0]} lists -> {args.out}"
    if calib is not None:
        msg += f"; calibrated nprobe={calib[0]} (min recall {calib[1]:.4f})"
    print(msg)


def cmd_search(args):
    from .pipeline import build_engine_from_catalog
    from .search.filters import SearchFilters
    from .serve.app import SearchService

    be = _batched_encoder(args)
    engine = build_engine_from_catalog(
        _catalog(args), be.for_role("document"), args.spool
    )
    svc = SearchService(engine, be.for_role("query"))
    rows = svc.search_and_display(
        args.query, SearchFilters(top_k=args.top_k, citation_weight=args.citation_weight)
    )
    for r in rows:
        print(f"[{r['similarity']:.4f}] {r['theorem_name']} — {r['paper_title']}")
        if r.get("theorem_slogan"):
            print(f"    {r['theorem_slogan'][:200]}")


def make_search_server(args):
    """Build the serving stack from a catalog: engine + encoder + (by
    default) the micro-batching scheduler with admission control, wrapped
    in a threaded HTTP server. Factored from cmd_serve so tests can start
    and stop it without blocking."""
    from .pipeline import build_engine_from_catalog
    from .serve.app import SearchService
    from .serve.http_api import SearchServer
    from .serve.scheduler import BatchScheduler

    import functools

    be = _batched_encoder(args)
    cat = _catalog(args)
    engine = build_engine_from_catalog(
        cat, be.for_role("document"), args.spool
    )
    sched = None
    if not args.no_batching:
        sched = BatchScheduler(
            engine,
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            encode_fn=functools.partial(be.encode_device, role="query"),
            max_pending=args.max_pending or None,
        )
    svc = SearchService(
        engine, be.for_role("query"), scheduler=sched,
        feedback_path=getattr(args, "feedback_path", None),
    )
    if getattr(args, "warm", False):
        # compile every program serving can hit BEFORE taking traffic:
        # pow2 query buckets through the production path, plus the
        # k+margin over-fetch programs that deletes/broad filters ride
        import numpy as _np

        buckets = [b for b in (1, 8, 32, 128) if b <= args.max_batch]
        buckets.append(args.max_batch)
        # citation-weighted requests retrieve the rerank POOL, not top_k
        # (search_pool_k -> max(50, 10*top_k)) — warm that k too, or the
        # first weighted query stalls behind the compile --warm exists
        # to prevent
        cfg = engine.config
        pool_k = max(cfg.rerank_min_pool, cfg.rerank_pool_multiple * cfg.top_k)
        for b in buckets:
            for k in (cfg.top_k, min(pool_k, engine.n_valid)):
                engine.search_vectors(_np.zeros((b, engine.dim), _np.float32), k=k)
        engine.warm_overfetch(batch_sizes=tuple(buckets))
        if pool_k < engine.n_valid:
            engine.warm_overfetch(batch_sizes=tuple(buckets), k=pool_k)
        # grouped heterogeneous-filter programs (one per bucket x G_pad):
        # without these the first mixed-filter window compiles mid-serve
        engine.warm_grouped(batch_sizes=tuple(buckets), k=cfg.top_k)
        if pool_k < engine.n_valid:
            engine.warm_grouped(batch_sizes=tuple(buckets), k=pool_k)
        # the ENCODER compiles per (batch-bucket, width-bucket) pair too —
        # without this the first text query still stalls on a fresh
        # XLA+Mosaic compile. Warm every batch bucket at the short width
        # (typical queries) and the saturation batch at every width
        # (long slogans/documents hit the bigger buckets)
        import jax as _jax

        for b in buckets:
            _jax.block_until_ready(be.encode_device(["x"] * b))
        for w in be.buckets:
            _jax.block_until_ready(
                be.encode_device(["x " * max(1, w - 4)] * buckets[-1])
            )
        print(f"[warm] scan + encoder programs compiled "
              f"(batch buckets {buckets}, k in ({cfg.top_k}, {pool_k}), "
              f"widths {list(be.buckets)})")
    refresh_s = getattr(args, "refresh_interval", 0.0) or 0.0
    if refresh_s > 0:
        # continuous ingest->searchable loop: newly sloganed theorems in
        # the catalog become live search results without a restart
        import threading
        import time as _time

        from .index import IndexBuilder
        from .pipeline import refresh_engine_from_catalog

        # re-open the spool the engine was built from so live-refreshed
        # vectors are durable: the manifest marks them embedded, and the
        # next restart's finalize() packs them into the main index
        spool = IndexBuilder(args.spool)

        def _poll():
            # sqlite connections are bound to their creating thread
            # (check_same_thread): the main thread's Catalog would raise
            # ProgrammingError on every poll — open one HERE, so the
            # refresh thread owns its own connection
            pcat = _catalog(args)
            while True:
                _time.sleep(refresh_s)
                try:
                    n = refresh_engine_from_catalog(
                        pcat, engine, be.for_role("document"), builder=spool
                    )
                    if n:
                        print(f"[refresh] {n} new docs live "
                              f"(corpus {engine.num_live})")
                except Exception as e:  # noqa: BLE001 — keep serving
                    print(f"[refresh] error: {e}")

        threading.Thread(target=_poll, daemon=True, name="catalog-refresh").start()
    return SearchServer(svc, host=args.host, port=args.port), sched


def cmd_serve(args):
    """HTTP serving daemon — the reference's `streamlit run
    streamlit_app.py` equivalent, but through the production
    micro-batched path (POST /search, GET /facets, GET /health)."""
    srv, sched = make_search_server(args)
    # serving-path GC discipline: the engine/encoder/metadata graph is
    # permanent — freeze it so periodic gen-2 passes stop stalling every
    # serving thread ~300 ms (utils/gc_tuning.py; SearchServer.start()
    # does the same for programmatic users, but this path calls
    # serve_forever directly)
    from .utils.gc_tuning import freeze_permanent

    freeze_permanent()
    print(f"serving on http://{args.host}:{srv.port}  "
          f"(batching={'off' if sched is None else 'on'})")
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        if sched is not None:
            sched.shutdown()


def cmd_eval(args):
    from .eval.harness import evaluate_encoder_on_validation

    be = _batched_encoder(args)
    m = evaluate_encoder_on_validation(
        be.for_role("query"), args.validation, args.context_window,
        doc_encode_fn=be.for_role("document"),
    )
    print(json.dumps({k: round(v, 4) for k, v in m.items()}))


def cmd_compare_embedders(args):
    """Side-by-side embedder evaluation on the validation set — the
    reference's model-selection workflow (compare_embeddings.py:429-470,
    verdict "Qwen3 0.6B is the best of three embedders"). Compares the
    named hermetic families, plus any --model-dir checkpoints (family
    auto-detected, role prompts applied)."""
    from .eval.experiments import best_embedder, compare_embedders

    encoders = {}
    for fam in args.families:
        ns = argparse.Namespace(embedder=fam, model_dir=None)
        encoders[fam] = _batched_encoder(ns).encode
    for md in args.model_dir or []:
        ns = argparse.Namespace(model_dir=md)
        be = _batched_encoder(ns)
        # asymmetric role prompts: queries and documents each get their
        # own prefix (single-callable values would query-prompt the docs)
        encoders[md] = (be.for_role("query"), be.for_role("document"))
    if not encoders:
        raise SystemExit("nothing to compare: pass --families and/or --model-dir")
    results = compare_embedders(encoders, args.validation, args.context_window)
    cols = list(results[0].metrics) if results else []
    print("\t".join(["embedder"] + cols))
    for r in results:
        print("\t".join([r.name] + [f"{r.metrics[c]:.4f}" for c in cols]))
    print(f"best (by H@k): {best_embedder(results)}")


def cmd_train(args):
    """Contrastive fine-tuning on (query, slogan) pairs — the training
    loop the reference lacks (its embedder is a frozen download). Pairs
    come from the validation CSV, the catalog's slogan<->body rows, and
    thumbs-up feedback; checkpoints save/resume through
    train/checkpoint.py; before/after retrieval metrics come from the
    eval harness on the same validation set."""
    import numpy as np

    import jax.numpy as jnp

    from .core.config import TrainConfig
    from .eval.harness import evaluate_encoder_on_validation
    from .train.checkpoint import restore_checkpoint, save_checkpoint
    from .train.contrastive import (
        TrainState,
        init_lora_train_state,
        make_lora_train_step,
        make_optimizer,
        make_train_step,
    )
    from .train.data import (
        batch_iterator,
        negatives_from_feedback,
        pairs_from_catalog,
        pairs_from_feedback,
        pairs_from_validation,
        tokenize_pairs,
    )

    be = _batched_encoder(args)
    cfg, tok = be.cfg, be.tokenizer
    tcfg = TrainConfig(
        batch_size=args.batch_size, seq_len=args.seq_len,
        learning_rate=args.lr, temperature=args.temperature,
        steps=args.steps, seed=args.seed,
        lora_rank=getattr(args, "lora_rank", 0),
        lora_alpha=getattr(args, "lora_alpha", 16.0),
    )
    use_lora = tcfg.lora_rank > 0
    if use_lora:
        from .train.lora import lora_merge, lora_num_params

    pairs = pairs_from_validation(args.validation, args.context_window)
    if getattr(args, "catalog", None):
        try:
            pairs += pairs_from_catalog(_catalog(args), limit=args.catalog_limit)
        except Exception as e:  # noqa: BLE001 — catalog optional for train
            print(f"[train] catalog pairs skipped: {e}")
    negatives: list = []
    if args.feedback:
        pairs += pairs_from_feedback(args.feedback)
        negatives = negatives_from_feedback(args.feedback)[: args.max_negatives]
    # tune under the SAME prompts serving applies: queries get the query
    # prefix, positives the document prefix (train/serve consistency)
    q_pre = be.prompts.get("query", "")
    d_pre = be.prompts.get("document", "")
    if q_pre or d_pre:
        pairs = [(q_pre + q, d_pre + d) for q, d in pairs]
    print(f"[train] {len(pairs)} pairs")

    def eval_metrics():
        return evaluate_encoder_on_validation(
            be.for_role("query"), args.validation, args.context_window,
            doc_encode_fn=be.for_role("document"),
        )

    # START from the encoder's CURRENT params — the loaded --model-dir
    # checkpoint or the hermetic init — not a fresh random init. LoRA
    # mode freezes those as the base and trains adapters only.
    base_params = be.params
    if use_lora:
        state = init_lora_train_state(base_params, tcfg)
        print(f"[train] lora rank {tcfg.lora_rank} "
              f"({lora_num_params(state.params):,} trainable params; "
              f"base frozen)")
    else:
        opt = make_optimizer(tcfg)
        state = TrainState(
            params=be.params, opt_state=opt.init(be.params),
            step=jnp.zeros((), jnp.int32),
        )
    start = 0
    if args.checkpoint_dir:
        # LoRA checkpoints hold the ADAPTER state — restore needs its
        # structure, not the full-fine-tune template
        restored = restore_checkpoint(
            args.checkpoint_dir, cfg, tcfg,
            template=state if use_lora else None,
        )
        if restored is not None:
            state = restored
            start = int(state.step)
            print(f"[train] resumed at step {start}")

    def adopt_params():
        """Point the serving encoder at the tuned weights."""
        be.params = (
            lora_merge(base_params, state.params, tcfg.lora_alpha)
            if use_lora else state.params
        )

    if start >= tcfg.steps:
        adopt_params()
        print(f"[train] checkpoint already at step {start} >= --steps "
              f"{tcfg.steps}; nothing to do")
        if args.eval:
            print("[train] metrics:", json.dumps(
                {k: round(v, 4) for k, v in eval_metrics().items()}))
        return

    if args.eval:
        m0 = eval_metrics()
        print("[train] before:", json.dumps({k: round(v, 4) for k, v in m0.items()}))

    arrays = tokenize_pairs(pairs, tok, tcfg.seq_len)
    neg_args = ()
    if negatives:
        # thumbs-down texts as explicit hard negatives, document-prompted
        # like the positives, shared by every batch (fixed shape)
        neg_enc = tok([d_pre + t for _, t in negatives],
                      max_length=tcfg.seq_len, pad_to=tcfg.seq_len)
        neg_args = (
            np.asarray(neg_enc.input_ids, np.int32),
            np.asarray(neg_enc.attention_mask, np.int32),
        )
        print(f"[train] {len(negatives)} hard negatives from feedback")
    if use_lora:
        _lora_step = make_lora_train_step(cfg, tcfg)

        def step_fn(st, *batch):
            return _lora_step(st, base_params, *batch)
    else:
        step_fn = make_train_step(cfg, tcfg)
    losses = []
    saved_at = None
    # seed the stream PAST the consumed prefix: a resumed run must not
    # replay the batches the checkpointed run already saw
    for i, (q_ids, q_mask, p_ids, p_mask) in enumerate(
        batch_iterator(
            arrays, tcfg.batch_size, tcfg.steps - start,
            seed=tcfg.seed + start,
        ),
        start=start + 1,
    ):
        state, loss = step_fn(state, q_ids, q_mask, p_ids, p_mask, *neg_args)
        losses.append(float(loss))
        if i % max(1, args.log_every) == 0:
            print(f"[train] step {i}: loss {np.mean(losses[-args.log_every:]):.4f}")
        if args.checkpoint_dir and args.checkpoint_every and i % args.checkpoint_every == 0:
            save_checkpoint(state, args.checkpoint_dir)
            saved_at = i
    if args.checkpoint_dir and saved_at != int(state.step):
        save_checkpoint(state, args.checkpoint_dir)
    if args.checkpoint_dir:
        print(f"[train] checkpoint saved to {args.checkpoint_dir}")

    # serve the tuned params through the SAME BatchedEncoder machinery
    adopt_params()
    if args.eval:
        m1 = eval_metrics()
        print("[train] after:", json.dumps({k: round(v, 4) for k, v in m1.items()}))
    print(f"[train] final loss {losses[-1]:.4f} over {len(losses)} steps")


def cmd_ingest_tex(args):
    """Ingest local .tex files directly (parity with the reference's
    selective_ingest.py GitHub-tex ingestor): each file becomes a
    synthetic paper + its extracted theorems."""
    from pathlib import Path

    from .ingest.latex.extract import extract_file

    cat = _catalog(args)
    total = 0
    for path in args.files:
        p = Path(path)
        thms = extract_file(str(p))
        pid = f"local-{p.stem}"
        cat.upsert_paper(
            {
                "paper_id": pid,
                "title": args.title or p.stem,
                "authors": args.authors or [],
                "summary": "",
                "link": f"file://{p.resolve()}",
                "last_updated": None,
                "journal_ref": None,
                "primary_category": args.category,
                "categories": [args.category],
                "citations": None,
            }
        )
        cat.replace_theorems(
            pid, [{"name": t.name, "body": t.body, "label": t.label} for t in thms], "scanner"
        )
        total += len(thms)
    print(f"ingested {total} theorems from {len(args.files)} files")


def cmd_quality(args):
    from .eval.quality import rate_slogans_quality

    report = rate_slogans_quality(_catalog(args), sample_size=args.sample)
    print(f"mean rating: {report.mean:.2f} over {len(report.ratings)} slogans")
    for sid, r in report.flagged:
        print(f"  flagged slogan_id={sid} rating={r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="theoremsearch_tpu")
    p.add_argument("--catalog", default="catalog.db")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("ingest-arxiv")
    s.add_argument("--categories", nargs="*")
    s.add_argument("--date-partition", default="month", choices=["year", "month", "week", "day"])
    s.add_argument("--citations", action="store_true")
    s.set_defaults(fn=cmd_ingest_arxiv)

    s = sub.add_parser("locate-s3")
    s.add_argument("--bundle-start", type=int, default=0)
    s.set_defaults(fn=cmd_locate_s3)

    s = sub.add_parser("parse")
    s.add_argument("--timeout", type=float, default=30.0)
    s.add_argument("--limit", type=int)
    s.add_argument(
        "--parsing-method", default="scanner",
        choices=["scanner", "flatten", "tex", "plastex"],
    )
    s.add_argument("--debugging-mode", action="store_true")
    s.set_defaults(fn=cmd_parse)

    s = sub.add_parser("stacks")
    s.add_argument("--parsed", required=True)
    s.add_argument("--tags")
    s.set_defaults(fn=cmd_stacks)

    s = sub.add_parser("slogans")
    s.add_argument("--model", default="offline-stub")
    s.add_argument("--prompt-id", default="body-only-v1")
    s.add_argument("--prompts-dir")
    s.add_argument("--workers", type=int, default=16)
    s.add_argument("--limit", type=int)
    s.add_argument("--trace")
    s.set_defaults(fn=cmd_slogans)

    s = sub.add_parser("embed")
    s.add_argument("--embedder", default="qwen", choices=["qwen", "gemma", "bert"],
                   help="embedder alias: tags the catalog rows AND picks the "
                        "hermetic architecture when --model-dir is absent")
    s.add_argument("--spool", default="./spool")
    s.add_argument("--model-dir")
    s.add_argument("--limit", type=int)
    s.add_argument(
        "--index-dtype", default=None,
        choices=["bfloat16", "int8", "int8-global", "int8-global-residual"],
        help="index layout the spool will finalize into (fixed at spool "
        "creation): int8-global unlocks the fused speed path; "
        "int8-global-residual adds the 2-bytes/dim two-level rescore "
        "(capacity mode, ~6M rows/chip at D=1024)",
    )
    s.set_defaults(fn=cmd_embed)

    s = sub.add_parser("build-ivf")
    s.add_argument("--spool", default="./spool")
    s.add_argument("--out", default="./ivf_index")
    s.add_argument("--nlist", type=int, default=0)
    s.add_argument("--residual", action="store_true",
                   help="2-bytes/dim capacity mode: rescore from two-level "
                   "int8 residual codes instead of a bf16 copy")
    s.add_argument("--calibrate", action="store_true",
                   help="auto-pick the smallest nprobe holding the recall gate")
    s.add_argument("--calibrate-gate", type=float, default=0.99)
    s.set_defaults(fn=cmd_build_ivf)

    s = sub.add_parser("search")
    s.add_argument("query")
    s.add_argument("--spool", default="./spool")
    s.add_argument("--model-dir")
    s.add_argument("--embedder", default="qwen", choices=["qwen", "gemma", "bert"],
                   help="hermetic model family when --model-dir is absent "
                        "(with --model-dir the family is auto-detected)")
    s.add_argument("--top-k", type=int, default=10)
    s.add_argument("--citation-weight", type=float, default=0.0)
    s.set_defaults(fn=cmd_search)

    s = sub.add_parser("serve")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--spool", default="./spool")
    s.add_argument("--model-dir")
    s.add_argument("--embedder", default="qwen", choices=["qwen", "gemma", "bert"],
                   help="hermetic model family when --model-dir is absent "
                        "(with --model-dir the family is auto-detected)")
    s.add_argument("--no-batching", action="store_true",
                   help="serve without the micro-batching scheduler")
    s.add_argument("--max-batch", type=int, default=256)
    s.add_argument("--max-wait-ms", type=float, default=8.0)
    s.add_argument("--max-pending", type=int, default=2048,
                   help="admission-control bound (0 = unbounded); beyond it requests get HTTP 429")
    s.add_argument("--feedback-path", default="feedback.jsonl",
                   help="JSONL file for POST /feedback votes (the InfoNCE "
                        "training signal); empty string disables")
    s.add_argument("--refresh-interval", type=float, default=0.0,
                   help="poll the catalog every N seconds for new slogans and "
                        "add them to the live index (0 = off)")
    s.add_argument("--warm", action="store_true",
                   help="pre-compile the scan programs (pow2 batch buckets "
                        "plus the delete/broad-filter over-fetch variants) "
                        "before accepting traffic — avoids 30-120s mid-run "
                        "compile stalls on a remote-attached chip")
    s.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8 = w8a8 projection matmuls on the query "
                        "encoder (1.14x measured forward on v5e, pooled "
                        "cosine 0.997+ vs bf16; qwen/gemma families)")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("eval")
    s.add_argument(
        "--validation",
        default=str(_pkg_root() / "data" / "validation_set.csv"),
        help="labeled eval CSV (default: the vendored copy in data/)",
    )
    s.add_argument("--context-window", default="body-and-summary-v1")
    s.add_argument("--model-dir")
    s.add_argument("--embedder", default="qwen", choices=["qwen", "gemma", "bert"],
                   help="hermetic model family when --model-dir is absent "
                        "(with --model-dir the family is auto-detected)")
    s.set_defaults(fn=cmd_eval)

    s = sub.add_parser("train")
    s.add_argument(
        "--validation",
        default=str(_pkg_root() / "data" / "validation_set.csv"),
    )
    s.add_argument("--context-window", default="body-and-summary-v1")
    s.add_argument("--catalog", default=None,
                   help="also pair latest slogans with theorem bodies from this catalog")
    s.add_argument("--catalog-limit", type=int, default=None)
    s.add_argument("--feedback", default=None,
                   help="feedback JSONL; thumbs-up rows become positives, "
                        "thumbs-down rows hard negatives")
    s.add_argument("--max-negatives", type=int, default=32)
    s.add_argument("--model-dir")
    s.add_argument("--embedder", default="qwen", choices=["qwen", "gemma", "bert"])
    s.add_argument("--steps", type=int, default=100)
    s.add_argument("--batch-size", type=int, default=32)
    s.add_argument("--seq-len", type=int, default=64)
    s.add_argument("--lr", type=float, default=1e-4)
    s.add_argument("--temperature", type=float, default=0.05)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--checkpoint-dir", default=None)
    s.add_argument("--checkpoint-every", type=int, default=50)
    s.add_argument("--log-every", type=int, default=10)
    s.add_argument("--eval", action="store_true",
                   help="report validation metrics before and after")
    s.add_argument("--lora-rank", type=int, default=0,
                   help="> 0 = parameter-efficient fine-tuning: freeze "
                        "the base encoder, train rank-r deltas on the "
                        "q/v projections, merge for serving (0 = full "
                        "fine-tune)")
    s.add_argument("--lora-alpha", type=float, default=16.0)
    s.set_defaults(fn=cmd_train)

    s = sub.add_parser("compare-embedders")
    s.add_argument(
        "--validation",
        default=str(_pkg_root() / "data" / "validation_set.csv"),
    )
    s.add_argument("--context-window", default="body-and-summary-v1")
    s.add_argument("--families", nargs="*", default=["qwen", "gemma", "bert"],
                   choices=["qwen", "gemma", "bert"],
                   help="hermetic families to compare")
    s.add_argument("--model-dir", action="append",
                   help="also compare a real checkpoint dir (repeatable)")
    s.set_defaults(fn=cmd_compare_embedders)

    s = sub.add_parser("ingest-tex")
    s.add_argument("files", nargs="+")
    s.add_argument("--title")
    s.add_argument("--authors", nargs="*")
    s.add_argument("--category", default="math.GM")
    s.set_defaults(fn=cmd_ingest_tex)

    s = sub.add_parser("quality")
    s.add_argument("--sample", type=int, default=20)
    s.set_defaults(fn=cmd_quality)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""Checkpoint loading: HuggingFace Qwen3 safetensors -> our params pytree.

The reference downloads 'Qwen/Qwen3-Embedding-0.6B' through
sentence-transformers at runtime (streamlit_app.py:52-59). Here the
checkpoint directory is an explicit input; in environments without the
assets the framework falls back to deterministic random init (the whole
retrieval stack is embedding-agnostic, and the eval gate — recall vs
exact on the same vectors — is checkpoint-independent).

Name mapping (HF Qwen3 -> ours):
    model.embed_tokens.weight                      -> embed
    model.norm.weight                              -> final_norm
    model.layers.{i}.input_layernorm.weight        -> layers[i].attn_norm
    model.layers.{i}.self_attn.{q,k,v,o}_proj.weight^T -> wq/wk/wv/wo
    model.layers.{i}.self_attn.{q,k}_norm.weight   -> q_norm/k_norm
    model.layers.{i}.post_attention_layernorm.weight -> mlp_norm
    model.layers.{i}.mlp.{gate,up,down}_proj.weight^T -> w_gate/w_up/w_down

HF stores Linear weights as (out, in); we store (in, out), hence the
transposes.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderConfig
from .model import Params


def config_from_hf(model_dir: str | Path) -> EncoderConfig:
    cfg = json.loads((Path(model_dir) / "config.json").read_text())
    return EncoderConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg["num_key_value_heads"],
        head_dim=cfg.get("head_dim", cfg["hidden_size"] // cfg["num_attention_heads"]),
        rope_theta=cfg.get("rope_theta", 1_000_000.0),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        embedding_dim=cfg["hidden_size"],
    )


def _iter_safetensors(model_dir: Path):
    try:
        from safetensors import safe_open
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("safetensors not available; cannot load HF checkpoint") from e
    for f in sorted(model_dir.glob("*.safetensors")):
        with safe_open(str(f), framework="np") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)


def load_hf_checkpoint(model_dir: str | Path, dtype: str = "bfloat16") -> tuple[Params, EncoderConfig]:
    """Build the params pytree from a local HF Qwen3 checkpoint dir."""
    model_dir = Path(model_dir)
    cfg = config_from_hf(model_dir)
    pdtype = jnp.dtype(dtype)

    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: Params = {"layers": layers}

    def to_param(arr: np.ndarray, transpose: bool, norm: bool):
        a = np.asarray(arr)
        if transpose:
            a = a.T
        return jnp.asarray(a, dtype=jnp.float32 if norm else pdtype)

    mapping = {
        "input_layernorm.weight": ("attn_norm", False, True),
        "self_attn.q_proj.weight": ("wq", True, False),
        "self_attn.k_proj.weight": ("wk", True, False),
        "self_attn.v_proj.weight": ("wv", True, False),
        "self_attn.o_proj.weight": ("wo", True, False),
        "self_attn.q_norm.weight": ("q_norm", False, True),
        "self_attn.k_norm.weight": ("k_norm", False, True),
        "post_attention_layernorm.weight": ("mlp_norm", False, True),
        "mlp.gate_proj.weight": ("w_gate", True, False),
        "mlp.up_proj.weight": ("w_up", True, False),
        "mlp.down_proj.weight": ("w_down", True, False),
    }

    for name, tensor in _iter_safetensors(model_dir):
        # bare Qwen3Model checkpoints store keys without the 'model.'
        # prefix; ForCausalLM-style (and the published embedding
        # checkpoints) include it. Accept both; skip lm_head.
        if name.startswith("lm_head."):
            continue
        if not name.startswith("model.") and (
            name == "embed_tokens.weight"
            or name == "norm.weight"
            or name.startswith("layers.")
        ):
            name = "model." + name
        if name == "model.embed_tokens.weight":
            params["embed"] = to_param(tensor, False, False)
        elif name == "model.norm.weight":
            params["final_norm"] = to_param(tensor, False, True)
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            li, sub = rest.split(".", 1)
            if sub in mapping:
                key, tr, is_norm = mapping[sub]
                layers[int(li)][key] = to_param(tensor, tr, is_norm)

    missing = [i for i, l in enumerate(layers) if len(l) != 11]
    if "embed" not in params or missing:
        raise ValueError(f"incomplete checkpoint: missing layers {missing[:4]}...")
    return params, cfg


# ---------------------------------------------------------------------------
# gemma family (EmbeddingGemma-300m-class: Gemma3 text tower + optional
# sentence-transformers Dense head)
# ---------------------------------------------------------------------------


def detect_family(model_dir: str | Path) -> str:
    """'gemma' for Gemma3-text checkpoints, 'bert' for BERT-class ones
    (the reference's three embedders: zbMath BERT / qwen / gemma,
    compare_embeddings.py:429-470), 'qwen' otherwise."""
    cfg = json.loads((Path(model_dir) / "config.json").read_text())
    mt = str(cfg.get("model_type", "")).lower()
    if mt.startswith("gemma") or "use_bidirectional_attention" in cfg:
        return "gemma"
    archs = [str(a).lower() for a in cfg.get("architectures", [])]
    if mt == "bert" or any(a.startswith("bert") for a in archs):
        # class names like BertModel/BertForMaskedLM; 'distilbert...'
        # deliberately excluded (different tensor layout)
        return "bert"
    return "qwen"


def gemma_config_from_hf(model_dir: str | Path) -> "GemmaEncoderConfig":
    from ..core.config import GemmaEncoderConfig

    cfg = json.loads((Path(model_dir) / "config.json").read_text())
    n_layers = cfg["num_hidden_layers"]
    # layer pattern: explicit layer_types list, else sliding_window_pattern
    layer_types = cfg.get("layer_types")
    if layer_types:
        fulls = [i for i, t in enumerate(layer_types) if t == "full_attention"]
        if not fulls:
            global_every = n_layers + 1   # all-sliding
        else:
            global_every = fulls[0] + 1
            want = [i for i in range(n_layers) if (i + 1) % global_every == 0]
            if fulls != want:
                raise ValueError(
                    f"irregular layer_types (full at {fulls}); only the "
                    f"every-Nth-global pattern is supported"
                )
    else:
        global_every = int(cfg.get("sliding_window_pattern", 6))
    scaling = cfg.get("rope_scaling") or {}
    factor = 1.0
    if scaling and scaling.get("rope_type", scaling.get("type", "default")) == "linear":
        factor = float(scaling.get("factor", 1.0))
    head_dim = cfg.get("head_dim", cfg["hidden_size"] // cfg["num_attention_heads"])
    # config.json stores the RAW sliding window (e.g. embeddinggemma's
    # 512); the bidirectional W//2+1 split happens in gemma.forward
    return GemmaEncoderConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=n_layers,
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg["num_key_value_heads"],
        head_dim=head_dim,
        rope_theta=cfg.get("rope_theta", 1_000_000.0),
        rope_local_theta=cfg.get("rope_local_base_freq", 10_000.0),
        rope_scaling_factor=factor,
        sliding_window=cfg.get("sliding_window", 512),
        global_every=global_every,
        query_pre_attn_scalar=float(cfg.get("query_pre_attn_scalar", head_dim)),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        embedding_dim=cfg["hidden_size"],
    )


_GEMMA_MAPPING = {
    "input_layernorm.weight": ("attn_norm", False, True),
    "post_attention_layernorm.weight": ("post_attn_norm", False, True),
    "pre_feedforward_layernorm.weight": ("pre_mlp_norm", False, True),
    "post_feedforward_layernorm.weight": ("post_mlp_norm", False, True),
    "self_attn.q_proj.weight": ("wq", True, False),
    "self_attn.k_proj.weight": ("wk", True, False),
    "self_attn.v_proj.weight": ("wv", True, False),
    "self_attn.o_proj.weight": ("wo", True, False),
    "self_attn.q_norm.weight": ("q_norm", False, True),
    "self_attn.k_norm.weight": ("k_norm", False, True),
    "mlp.gate_proj.weight": ("w_gate", True, False),
    "mlp.up_proj.weight": ("w_up", True, False),
    "mlp.down_proj.weight": ("w_down", True, False),
}


def _load_st_dense(dense_dir: Path, pdtype):
    """One sentence-transformers Dense module dir: linear.weight
    (out, in) in model.safetensors, optional linear.bias."""
    w = b = None
    for name, tensor in _iter_safetensors(dense_dir):
        if name.endswith("weight"):
            w = np.asarray(tensor).T
        elif name.endswith("bias"):
            b = np.asarray(tensor)
    if w is None:
        raise ValueError(f"no linear.weight in {dense_dir}")
    return (
        jnp.asarray(w, dtype=pdtype),
        jnp.asarray(b if b is not None else np.zeros(w.shape[1]), jnp.float32),
    )


def load_hf_gemma_checkpoint(
    model_dir: str | Path, dtype: str = "bfloat16"
) -> tuple[dict, "GemmaEncoderConfig"]:
    """Params pytree from a local EmbeddingGemma/Gemma3-text checkpoint.

    Tower weights follow the Gemma3TextModel layout (with or without a
    'model.' prefix). If sentence-transformers Dense module dirs exist
    next to the tower ('2_Dense'/'3_Dense', the embeddinggemma module
    stack after 1_Pooling), they become the projection head and
    embedding_dim/head_hidden are taken from their shapes; otherwise the
    pooled hidden is the embedding (head-less Gemma3 tower)."""
    from dataclasses import replace

    model_dir = Path(model_dir)
    cfg = gemma_config_from_hf(model_dir)
    pdtype = jnp.dtype(dtype)

    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}

    def to_param(arr: np.ndarray, transpose: bool, norm: bool):
        a = np.asarray(arr)
        if transpose:
            a = a.T
        return jnp.asarray(a, dtype=jnp.float32 if norm else pdtype)

    for name, tensor in _iter_safetensors(model_dir):
        if name.startswith("lm_head."):
            continue
        if not name.startswith("model.") and (
            name == "embed_tokens.weight"
            or name == "norm.weight"
            or name.startswith("layers.")
        ):
            name = "model." + name
        if name == "model.embed_tokens.weight":
            params["embed"] = to_param(tensor, False, False)
        elif name == "model.norm.weight":
            params["final_norm"] = to_param(tensor, False, True)
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            li, sub = rest.split(".", 1)
            if sub in _GEMMA_MAPPING:
                key, tr, is_norm = _GEMMA_MAPPING[sub]
                layers[int(li)][key] = to_param(tensor, tr, is_norm)

    missing = [i for i, l in enumerate(layers) if len(l) != 13]
    if "embed" not in params or missing:
        raise ValueError(f"incomplete gemma checkpoint: missing layers {missing[:4]}...")

    dense_dirs = sorted(
        d for d in model_dir.iterdir() if d.is_dir() and d.name.endswith("_Dense")
    )
    if dense_dirs:
        if len(dense_dirs) != 2:
            raise ValueError(f"expected 2 ST Dense modules, found {dense_dirs}")
        params["head_w1"], params["head_b1"] = _load_st_dense(dense_dirs[0], pdtype)
        params["head_w2"], params["head_b2"] = _load_st_dense(dense_dirs[1], pdtype)
        cfg = replace(
            cfg,
            head_hidden=params["head_w1"].shape[1],
            embedding_dim=params["head_w2"].shape[1],
        )
    return params, cfg


def load_st_prompts(model_dir: str | Path) -> dict:
    """Role prompts from config_sentence_transformers.json ("prompts":
    name -> text prefix; embeddinggemma ships 'query'/'document' among
    others, qwen an instruct template). Empty dict when absent — the
    hermetic path and bare-tower checkpoints carry none."""
    p = Path(model_dir) / "config_sentence_transformers.json"
    if not p.exists():
        return {}
    try:
        cfg = json.loads(p.read_text())
    except (OSError, json.JSONDecodeError) as e:
        # a checkpoint that SHIPS the file but can't be read must not
        # silently serve prompt-less queries against a prompted corpus
        import warnings

        warnings.warn(f"unreadable {p.name} ({e}); role prompts DISABLED")
        return {}
    prompts = cfg.get("prompts") or {}
    return {str(k): str(v) for k, v in prompts.items()}


# ---------------------------------------------------------------------------
# bert family (zbMath-BERT-class: standard BertModel layout)
# ---------------------------------------------------------------------------


def bert_config_from_hf(model_dir: str | Path) -> "BertEncoderConfig":
    from ..core.config import BertEncoderConfig

    cfg = json.loads((Path(model_dir) / "config.json").read_text())
    act = cfg.get("hidden_act", "gelu")
    if act not in ("gelu", "gelu_new"):
        raise ValueError(f"unsupported BERT hidden_act {act!r}")
    return BertEncoderConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        type_vocab_size=cfg.get("type_vocab_size", 2),
        hidden_act=act,
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        max_seq_len=cfg.get("max_position_embeddings", 512),
        embedding_dim=cfg["hidden_size"],
    )


_BERT_LAYER_MAPPING = {
    "attention.self.query.weight": ("wq", True, False),
    "attention.self.query.bias": ("bq", False, True),
    "attention.self.key.weight": ("wk", True, False),
    "attention.self.key.bias": ("bk", False, True),
    "attention.self.value.weight": ("wv", True, False),
    "attention.self.value.bias": ("bv", False, True),
    "attention.output.dense.weight": ("wo", True, False),
    "attention.output.dense.bias": ("bo", False, True),
    "attention.output.LayerNorm.weight": ("attn_ln_g", False, True),
    "attention.output.LayerNorm.bias": ("attn_ln_b", False, True),
    "intermediate.dense.weight": ("w_in", True, False),
    "intermediate.dense.bias": ("b_in", False, True),
    "output.dense.weight": ("w_out", True, False),
    "output.dense.bias": ("b_out", False, True),
    "output.LayerNorm.weight": ("mlp_ln_g", False, True),
    "output.LayerNorm.bias": ("mlp_ln_b", False, True),
}


def load_hf_bert_checkpoint(
    model_dir: str | Path, dtype: str = "bfloat16"
) -> tuple[dict, "BertEncoderConfig"]:
    """Params pytree from a local BERT-class checkpoint (standard
    BertModel tensor layout, with or without a 'bert.' prefix; the
    pooler head is skipped — sentence-transformers mean pooling is the
    reference's inference path)."""
    model_dir = Path(model_dir)
    cfg = bert_config_from_hf(model_dir)
    pdtype = jnp.dtype(dtype)

    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}

    def to_param(arr: np.ndarray, transpose: bool, norm: bool):
        a = np.asarray(arr)
        if transpose:
            a = a.T
        return jnp.asarray(a, dtype=jnp.float32 if norm else pdtype)

    embed_map = {
        "embeddings.word_embeddings.weight": ("embed", False, False),
        "embeddings.position_embeddings.weight": ("pos_embed", False, False),
        "embeddings.token_type_embeddings.weight": ("type_embed", False, False),
        "embeddings.LayerNorm.weight": ("embed_ln_g", False, True),
        "embeddings.LayerNorm.bias": ("embed_ln_b", False, True),
    }
    for name, tensor in _iter_safetensors(model_dir):
        if name.startswith("bert."):
            name = name[len("bert."):]
        if name.startswith(("pooler.", "cls.")):
            continue
        if name in embed_map:
            key, tr, is_norm = embed_map[name]
            params[key] = to_param(tensor, tr, is_norm)
        elif name.startswith("encoder.layer."):
            rest = name[len("encoder.layer."):]
            li, sub = rest.split(".", 1)
            if sub in _BERT_LAYER_MAPPING:
                key, tr, is_norm = _BERT_LAYER_MAPPING[sub]
                layers[int(li)][key] = to_param(tensor, tr, is_norm)

    missing = [i for i, l in enumerate(layers) if len(l) != 16]
    if "embed" not in params or missing:
        raise ValueError(f"incomplete bert checkpoint: missing layers {missing[:4]}...")
    return params, cfg

"""HF-tokenizer goldens (VERDICT r1 item 5 fallback).

Qwen3-Embedding-0.6B checkpoint assets are not obtainable in this
zero-egress environment, so true encoder parity (cosine > 0.999 vs
sentence-transformers outputs) cannot be demonstrated here. What CAN be
proven offline is the integration boundary on our side of the checkpoint:
HFTokenizer drives the real `transformers`/`tokenizers` machinery from a
local tokenizer.json exactly the way a real checkpoint directory would,
produces the padding/mask conventions the encoder's last-valid-token
pooling expects, and works through BatchedEncoder end-to-end.

The goldens use a handwritten WordLevel tokenizer.json — a genuine
HF-`tokenizers` asset loaded through AutoTokenizer, not a mock — with an
EOS-appending template mirroring Qwen3-Embedding's convention
(no BOS; EOS terminates the sequence; reference loads the model via
sentence-transformers, streamlit_app.py:52-59)."""

import json

import numpy as np
import pytest

from theoremsearch_tpu.encoder.tokenizer import HFTokenizer, get_tokenizer

VOCAB = {
    "<pad>": 0, "<eos>": 1, "<unk>": 2,
    "the": 3, "riemann": 4, "hypothesis": 5, "zeta": 6, "function": 7,
    "prime": 8, "theorem": 9,
}


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_tok")
    tokenizer_json = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": 0, "content": "<pad>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
            {"id": 1, "content": "<eos>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
            {"id": 2, "content": "<unk>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
        ],
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        # Qwen3-Embedding convention: no BOS, EOS appended
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "<eos>", "type_id": 0}},
            ],
            "pair": [
                {"Sequence": {"id": "A", "type_id": 0}},
                {"Sequence": {"id": "B", "type_id": 0}},
                {"SpecialToken": {"id": "<eos>", "type_id": 0}},
            ],
            "special_tokens": {
                "<eos>": {"id": "<eos>", "ids": [1], "tokens": ["<eos>"]},
            },
        },
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": VOCAB, "unk_token": "<unk>"},
    }
    (d / "tokenizer.json").write_text(json.dumps(tokenizer_json))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "pad_token": "<pad>",
        "eos_token": "<eos>",
        "unk_token": "<unk>",
        "model_max_length": 32,
    }))
    return str(d)


def test_golden_ids_and_mask(tok_dir):
    tok = HFTokenizer(tok_dir)
    enc = tok(["the riemann hypothesis", "zeta"], pad_to=8)
    # golden: lowercased wordlevel ids + EOS, right-padded with <pad>=0
    np.testing.assert_array_equal(
        enc.input_ids,
        [[3, 4, 5, 1, 0, 0, 0, 0],
         [6, 1, 0, 0, 0, 0, 0, 0]],
    )
    np.testing.assert_array_equal(
        enc.attention_mask,
        [[1, 1, 1, 1, 0, 0, 0, 0],
         [1, 1, 0, 0, 0, 0, 0, 0]],
    )


def test_eos_is_last_valid_token(tok_dir):
    """The encoder pools the LAST VALID position (model.py last_token
    pooling via cumsum(mask)-1); with right padding that position must be
    the EOS slot — the Qwen3-Embedding pooling contract."""
    tok = HFTokenizer(tok_dir)
    enc = tok(["prime theorem", "the zeta function the"], pad_to=10)
    lengths = enc.attention_mask.sum(1)
    last = enc.input_ids[np.arange(2), lengths - 1]
    np.testing.assert_array_equal(last, [1, 1])  # <eos>


def test_unknown_words_map_to_unk(tok_dir):
    tok = HFTokenizer(tok_dir)
    enc = tok(["cohomology"], pad_to=4)
    np.testing.assert_array_equal(enc.input_ids, [[2, 1, 0, 0]])


def test_truncation_golden(tok_dir):
    tok = HFTokenizer(tok_dir)
    enc = tok(["the the the the the the"], pad_to=4)
    assert enc.input_ids.shape == (1, 4)
    assert enc.attention_mask.sum() == 4


def test_tokenize_for_bucketing(tok_dir):
    """BatchedEncoder length-buckets via tokenizer.tokenize(text)."""
    tok = HFTokenizer(tok_dir)
    assert tok.tokenize("the riemann hypothesis") == [3, 4, 5]
    assert tok.tokenize("") == []


def test_get_tokenizer_prefers_hf_assets(tok_dir):
    tok = get_tokenizer(tok_dir)
    assert isinstance(tok, HFTokenizer)
    missing = get_tokenizer("/nonexistent/dir", vocab_size=64)
    assert missing.vocab_size == 64  # SimpleTokenizer fallback


def test_batched_encoder_with_hf_tokenizer(tok_dir):
    """End-to-end: HF tokenizer through BatchedEncoder and the JAX
    forward — embeddings are deterministic, normalized, and insensitive
    to batch composition (padding correctness)."""
    import jax

    from theoremsearch_tpu.core.config import EncoderConfig
    from theoremsearch_tpu.encoder.batching import BatchedEncoder
    from theoremsearch_tpu.encoder.model import init_params

    cfg = EncoderConfig.tiny().replace(vocab_size=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    enc = BatchedEncoder(params, cfg, tokenizer=HFTokenizer(tok_dir),
                         batch_size=4, buckets=(8, 16))
    texts = ["the riemann hypothesis", "zeta function", "prime theorem",
             "the prime zeta", "hypothesis"]
    emb = enc.encode(texts)
    assert emb.shape == (5, cfg.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    # same text alone == same text in a batch (padding/bucketing correct)
    solo = enc.encode([texts[1]])
    np.testing.assert_allclose(solo[0], emb[1], atol=1e-5)


def test_encode_pretokenized_matches_call(tok_dir):
    """The serving batcher assembles batches from pre-tokenized id lists
    (one tokenizer pass, not two); the result must be identical to the
    full __call__ path, including truncation and special-token layout."""
    tok = HFTokenizer(tok_dir)
    texts = [
        "group theory is fun",
        "every finite group has order",
        "zzz unknown words here",
        "",
        "a " * 40,   # forces truncation at small widths
    ]
    for width in (8, 16, 64):
        full = tok(texts, max_length=width, pad_to=width)
        pre = tok.encode_pretokenized(
            [tok.tokenize(t) for t in texts], pad_to=width
        )
        np.testing.assert_array_equal(full.input_ids, pre.input_ids)
        np.testing.assert_array_equal(full.attention_mask, pre.attention_mask)


def test_simple_encode_pretokenized_matches_call():
    from theoremsearch_tpu.encoder.tokenizer import SimpleTokenizer

    tk = SimpleTokenizer(vocab_size=1000)
    texts = ["one two three", "", "x " * 30]
    for width in (8, 32):
        full = tk(texts, max_length=width, pad_to=width)
        pre = tk.encode_pretokenized([tk.tokenize(t) for t in texts], pad_to=width)
        np.testing.assert_array_equal(full.input_ids, pre.input_ids)
        np.testing.assert_array_equal(full.attention_mask, pre.attention_mask)

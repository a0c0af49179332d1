from .model import QwenEncoder, init_params, forward, encode_pooled
from .gemma import GemmaEncoder
from .bert import BertEncoder
from .tokenizer import SimpleTokenizer, get_tokenizer
from .batching import BatchedEncoder

__all__ = [
    "QwenEncoder",
    "GemmaEncoder",
    "BertEncoder",
    "init_params",
    "forward",
    "encode_pooled",
    "SimpleTokenizer",
    "get_tokenizer",
    "BatchedEncoder",
]

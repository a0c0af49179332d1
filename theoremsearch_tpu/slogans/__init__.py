from .prompts import PromptConfig, load_prompt
from .client import LLMClient, OfflineStubClient, get_client, MODELS
from .generate import generate_slogans
from .cost import format_usd, CostTracker

__all__ = [
    "PromptConfig",
    "load_prompt",
    "LLMClient",
    "OfflineStubClient",
    "get_client",
    "MODELS",
    "generate_slogans",
    "format_usd",
    "CostTracker",
]

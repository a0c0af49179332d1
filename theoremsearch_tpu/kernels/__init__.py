from .mips import (
    fused_mips_topk,
    xla_mips_topk,
    xla_mips_topk_scan,
    merge_topk,
)

__all__ = [
    "fused_mips_topk",
    "xla_mips_topk",
    "xla_mips_topk_scan",
    "merge_topk",
]

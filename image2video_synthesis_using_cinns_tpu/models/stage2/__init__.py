from .flow import ConditionalFlow, flow_forward, flow_reverse, init_flow_blocks
from .distributions import DiagonalGaussianDistribution

__all__ = [
    "ConditionalFlow",
    "flow_forward",
    "flow_reverse",
    "init_flow_blocks",
    "DiagonalGaussianDistribution",
]

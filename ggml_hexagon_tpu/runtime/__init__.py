from .engine import Engine, PerfCounters
from .sampling import SamplerChain, make_chain, greedy_chain

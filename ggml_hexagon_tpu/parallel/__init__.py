from .sharding import make_mesh, shard_llama_weights, shard_kv_cache, shard_tokens
from .pipeline import (make_pp_mesh, pipeline_forward, shard_pipeline,
                       stack_layers)
from .sharding import make_sp_mesh, shard_kv_cache_seq  # noqa: F401
from .tp_fast import (make_tp_mesh, shard_llama_weights_tp,  # noqa: F401
                      shard_kv_cache_tp, tp_decode_step)

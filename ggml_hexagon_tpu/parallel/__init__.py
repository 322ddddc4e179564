from .sharding import make_mesh, shard_llama_weights, shard_kv_cache, shard_tokens

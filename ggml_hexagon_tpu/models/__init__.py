from .llama import LlamaConfig, forward, init_kv_cache, load_llama_weights

"""Command-line interface — the reference's tool suite as subcommands.

Mapping to /root/reference/examples/ (run `gen-docs` for full flag docs):
  generate        <- llama-cli (main): sampling flags, --prompt-cache,
                     --cache-type, --lookahead/--lookup/--draft-model
  chat            <- simple-chat / llama-cli conversation mode
  llava / tts     <- llava-cli / tts (multimodal, OuteTTS+WavTokenizer)
  quantize        <- llama-quantize (+imatrix); quantize-stats
  perplexity      <- llama-perplexity: PPL/KL-div protocol
  imatrix         <- llama-imatrix; eval-callback <- eval-callback
  bench           <- llama-bench + batched-bench (-b parallel sweep)
  embedding / retrieval / passkey / infill / save-load-state <- same-named
  export-lora / cvector-generator <- same-named
  gguf-info / gguf-hash / gguf-split / convert-legacy <- gguf tools +
                     convert_llama_ggml_to_gguf
  gbnf-validator  <- gbnf-validator; tokenize <- llama-tokenize
  gen-docs        <- gen-docs
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def cmd_generate(args):
    import numpy as np

    from .runtime import Engine, make_chain
    from .runtime.device_sampling import DeviceSamplerParams

    kv_dtype = {"f32": "float32", "f16": "bfloat16", "bf16": "bfloat16",
                "q8_0": "q8_0", "q4_0": "q4_0"}[args.cache_type]
    if kv_dtype not in ("q8_0", "q4_0"):
        import jax.numpy as jnp

        kv_dtype = getattr(jnp, kv_dtype)
    import os as _os

    cd_kw = {}
    if _os.environ.get("GHT_COMPUTE_F32"):  # parity runs: match llama.cpp f32
        import jax.numpy as _jnp

        cd_kw = dict(compute_dtype=_jnp.float32)
        if kv_dtype not in ("q8_0", "q4_0"):
            kv_dtype = _jnp.float32
    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size,
                           kv_dtype=kv_dtype, fuse=True, **cd_kw)
    if args.prompt_tokens:
        ids = [int(t) for t in args.prompt_tokens.replace(",", " ").split()]
    elif args.prompt is None:
        print("error: --prompt required", file=sys.stderr)
        return 1
    elif eng.tokenizer is None:
        print("error: model has no tokenizer; use --prompt-tokens",
              file=sys.stderr)
        return 1
    else:
        ids = eng.tokenizer.encode(args.prompt)
    print(f"prompt tokens: {ids}", file=sys.stderr)
    t0 = time.time()
    if args.on_device:
        out = eng.generate_ondevice(
            ids, n_predict=args.n_predict,
            params=DeviceSamplerParams(temp=args.temp, top_k=args.top_k,
                                       top_p=args.top_p, min_p=args.min_p),
            seed=args.seed,
        )
        toks = list(out)
    elif args.lookahead or args.lookup or args.draft_model:
        if args.draft_model:  # examples/speculative analog
            from .runtime.speculative import SpeculativeDecoder

            dec = SpeculativeDecoder(
                eng, Engine.from_gguf(args.draft_model, max_seq=args.ctx_size))
            kind = "speculative"
        elif args.lookup:  # examples/lookup analog
            from .runtime.lookup import LookupDecoder

            dec = LookupDecoder(eng)
            kind = "lookup"
        else:  # examples/lookahead analog
            from .runtime.lookahead import LookaheadDecoder

            dec = LookaheadDecoder(eng)
            kind = "lookahead"
        toks = dec.generate(ids, n_predict=args.n_predict,
                            sampler=make_chain(temp=args.temp, seed=args.seed))
        print(f"[{kind}: {dec.stats.n_accepted}/{dec.stats.n_drafted} "
              f"drafted tokens accepted]", file=sys.stderr)
    else:
        chain = make_chain(temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                           min_p=args.min_p, seed=args.seed,
                           penalty_repeat=args.repeat_penalty,
                           penalty_last_n=args.repeat_last_n)
        import os as _os

        reuse = False
        if args.prompt_cache and _os.path.exists(args.prompt_cache):
            # llama-cli --prompt-cache: restore the saved session and reuse
            # the longest matching prompt prefix (main.cpp:238-368)
            eng.load_state(args.prompt_cache)
            reuse = True
            print(f"restored prompt cache ({eng.n_past} tokens)",
                  file=sys.stderr)
        toks = []
        for t in eng.generate(ids, n_predict=args.n_predict, sampler=chain,
                              reuse_cache=reuse):
            toks.append(t)
            if args.stream:
                sys.stdout.write(eng.tokenizer.decode([t], skip_special=False)
                                 if eng.tokenizer else f"{t} ")
                sys.stdout.flush()
        if args.prompt_cache:
            eng.save_state(args.prompt_cache)
    if not args.stream:
        print(eng.tokenizer.decode(toks) if eng.tokenizer else
              " ".join(str(t) for t in toks))
    else:
        print()
    print(f"[{eng.perf.report()}]", file=sys.stderr)
    return 0


def cmd_llava(args):
    """llava-cli analog: prompt with an <image> placeholder + image file
    (raw .npy HxWx3 uint8, or any format if PIL is importable)."""
    import numpy as np

    from .runtime import make_chain
    from .runtime.llava import LlavaEngine

    lv = LlavaEngine.from_gguf(args.model, args.mmproj, max_seq=args.ctx_size)
    eng = lv.engine
    if args.image.endswith(".npy"):
        img = np.load(args.image)
    else:
        try:
            from PIL import Image  # optional; not baked into this env
        except ImportError:
            print("error: non-.npy images need PIL", file=sys.stderr)
            return 1
        img = np.asarray(Image.open(args.image).convert("RGB"))
    before, _, after = args.prompt.partition("<image>")
    segs = [("tokens", eng.tokenizer.encode(before)), ("image", img)]
    if after:
        segs.append(("tokens", eng.tokenizer.encode(after)))
    chain = make_chain(temp=args.temp, seed=args.seed)
    toks = lv.generate(segs, n_predict=args.n_predict, sampler=chain)
    print(eng.tokenizer.decode(toks))
    return 0


def cmd_tts(args):
    """llama-tts analog: OuteTTS LM + WavTokenizer vocoder -> WAV.

    --codes skips the LM and feeds raw vocoder codes (space/comma separated),
    mirroring the reference's embd-file debug path (tts.cpp:1046-1066)."""
    import numpy as np

    from .models.wavtokenizer import (SAMPLE_RATE, codes_to_audio,
                                      load_wavtok_weights, save_wav16)
    from .gguf import GGUFReader

    if args.codes:
        codes = np.asarray(
            [int(t) for t in args.codes.replace(",", " ").split()], np.int32)
        with GGUFReader.open(args.vocoder) as r:
            cfg, w = load_wavtok_weights(r)
        audio = codes_to_audio(cfg, w, codes)
    else:
        from .runtime.tts import synthesize

        if not args.model or args.prompt is None:
            print("error: --model and --prompt required (or use --codes)",
                  file=sys.stderr)
            return 1
        audio = synthesize(args.model, args.vocoder, args.prompt,
                           speaker_file=args.speaker,
                           n_predict=args.n_predict, max_seq=args.ctx_size)
    save_wav16(args.output, audio)
    print(f"wrote {args.output}: {audio.shape[0]} samples "
          f"({audio.shape[0]/SAMPLE_RATE:.2f}s @ {SAMPLE_RATE} Hz)")
    return 0


def cmd_eval_callback(args):
    """eval-callback analog: run one eval, print every tapped tensor
    (the reference's per-node sched eval-callback dump,
    examples/eval-callback/eval-callback.cpp)."""
    import jax.numpy as jnp
    import numpy as np

    from .gguf import GGUFReader
    from .models.llama import forward, init_kv_cache, load_llama_weights
    from .tokenizer import Vocab, build_tokenizer

    with GGUFReader.open(args.model) as r:
        cfg, weights = load_llama_weights(r)
        vocab = Vocab.from_gguf(r.metadata)
    ids = build_tokenizer(vocab).encode(args.prompt)
    taps = []

    def tap(name, x, **_kw):
        taps.append((name, x))

    kv = init_kv_cache(cfg, 1, max(len(ids), 8))
    forward(cfg, weights, jnp.asarray(np.asarray(ids, np.int32)[None]), kv,
            jnp.int32(0), logits_all=True, tap=tap)
    seen = set()
    for name, x in taps:
        if name in seen:  # fused taps can fire twice per weight
            continue
        seen.add(name)
        a = np.asarray(x, np.float32).reshape(-1)
        head = " ".join(f"{v:9.4f}" for v in a[: args.n_values])
        print(f"{name:36s} shape={tuple(x.shape)} "
              f"sum={a.sum():12.4f}  [{head} ...]")
    print(f"{len(seen)} tensors dumped")
    return 0


def cmd_embedding(args):
    """llama-embedding analog: pooled embeddings for one or more prompts."""
    from .gguf import GGUFReader
    from .models.llama import load_llama_weights
    from .runtime.embedding import extract_embeddings
    from .tokenizer import Vocab, build_tokenizer

    with GGUFReader.open(args.model) as r:
        cfg, weights = load_llama_weights(r)
        vocab = Vocab.from_gguf(r.metadata)
    tok = build_tokenizer(vocab)
    prompts = args.prompt if args.prompt else [sys.stdin.read()]
    ids = [tok.encode(p) for p in prompts]
    emb = extract_embeddings(cfg, weights, ids, pooling=args.pooling,
                             normalize=not args.no_normalize)
    for row in emb:
        print(" ".join(f"{v:.6f}" for v in row[: args.n_print]) +
              (" ..." if len(row) > args.n_print else ""))
    return 0


def cmd_retrieval(args):
    """llama-retrieval analog: chunk files, embed, rank vs a query."""
    import numpy as np

    from .gguf import GGUFReader
    from .models.llama import load_llama_weights
    from .runtime.embedding import extract_embeddings
    from .tokenizer import Vocab, build_tokenizer

    chunks = []
    for path in args.files:
        text = open(path).read()
        for seg in text.split(args.separator):
            seg = seg.strip()
            if len(seg) >= args.chunk_size:
                chunks.append((path, seg))
            elif seg and chunks and chunks[-1][0] == path:
                chunks[-1] = (path, chunks[-1][1] + args.separator + seg)
            elif seg:
                chunks.append((path, seg))
    with GGUFReader.open(args.model) as r:
        cfg, weights = load_llama_weights(r)
        vocab = Vocab.from_gguf(r.metadata)
    tok = build_tokenizer(vocab)
    emb = extract_embeddings(cfg, weights, [tok.encode(c) for _, c in chunks],
                             pooling=args.pooling)
    q = extract_embeddings(cfg, weights, [tok.encode(args.query)],
                           pooling=args.pooling)[0]
    sims = emb @ q
    for i in np.argsort(-sims)[: args.top_k]:
        src, text = chunks[i]
        print(f"{sims[i]:.4f}  {src}: {text[:120]!r}")
    return 0


def cmd_passkey(args):
    """llama-passkey analog: long-context retrieval smoke test."""
    from .runtime import Engine, make_chain

    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size)
    if getattr(args, "grp_attn_n", 1) > 1:
        eng.enable_self_extend(args.grp_attn_n, args.grp_attn_w)
    junk = ("The grass is green. The sky is blue. The sun is yellow. "
            "Here we go. There and back again. ")
    key = str(args.passkey)
    pos = args.pos if args.pos >= 0 else args.n_junk // 2
    parts = [junk] * args.n_junk
    parts.insert(pos, f" The pass key is {key}. Remember it. {key} is the "
                      "pass key. ")
    prompt = ("There is an important info hidden inside a lot of irrelevant "
              "text. Find it and memorize it. " + "".join(parts) +
              " What is the pass key? The pass key is")
    ids = eng.tokenizer.encode(prompt)
    print(f"prompt: {len(ids)} tokens, key at junk index {pos}",
          file=sys.stderr)
    toks = list(eng.generate(ids, n_predict=args.n_predict,
                             sampler=make_chain(temp=0.0)))
    out = eng.tokenizer.decode(toks)
    ok = key in out
    print(f"response: {out.strip()!r}\npasskey {'FOUND' if ok else 'MISSING'}")
    return 0 if ok else 1


def cmd_save_load_state(args):
    """save-load-state analog: prove state round-trip determinism."""
    import numpy as np

    from .runtime import Engine, make_chain

    def greedy_continue(e, last_tok, n):
        out = []
        logits = e.decode_one(np.asarray([last_tok], np.int32))
        for _ in range(n):
            tok = int(np.argmax(logits[0]))
            out.append(tok)
            logits = e.decode_one(np.asarray([tok], np.int32))
        return out

    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size)
    ids = eng.tokenizer.encode(args.prompt)
    state = args.output or "state.bin"
    eng.prefill(np.asarray(ids[:-1], np.int32)[None, :])
    eng.save_state(state)  # state holds the prompt prefix only
    first = greedy_continue(eng, ids[-1], args.n_predict)
    eng2 = Engine.from_gguf(args.model, max_seq=args.ctx_size)
    eng2.load_state(state)  # resumes without re-running the prompt
    second = greedy_continue(eng2, ids[-1], args.n_predict)
    same = first == second
    print(f"first : {first}\nsecond: {second}\n"
          f"state round-trip {'OK' if same else 'MISMATCH'}")
    return 0 if same else 1


def cmd_infill(args):
    """llama-infill analog: fill-in-middle completion via FIM tokens."""
    from .gguf import GGUFReader
    from .runtime import Engine, make_chain

    from .runtime.infill import format_infill

    with GGUFReader.open(args.model) as r:
        md = dict(r.metadata)
    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size)
    try:
        ids = format_infill(md, eng.tokenizer, args.in_prefix, args.in_suffix,
                            n_predict=args.n_predict, n_ctx=args.ctx_size)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    chain = make_chain(temp=args.temp, seed=args.seed)
    toks = list(eng.generate(ids, n_predict=args.n_predict, sampler=chain))
    print(args.in_prefix + eng.tokenizer.decode(toks) + args.in_suffix)
    return 0


def cmd_parallel(args):
    """llama-parallel analog (examples/parallel/parallel.cpp): simulate N
    clients answering M sequences with continuous batching; report
    per-client and aggregate throughput."""
    import numpy as np

    from .runtime.sampling import make_chain
    from .server import BatchEngine

    pool = [
        "What is the meaning of life?",
        "Tell me an interesting fact about llamas.",
        "What is the best way to cook a steak?",
        "Are you familiar with the Special Theory of Relativity?",
        "Recommend some interesting books to read.",
        "What is the best way to learn a new language?",
    ]
    if args.file:
        with open(args.file) as fh:
            pool = [ln.strip() for ln in fh if ln.strip()]
    system = ("A chat between a curious user and an artificial intelligence "
              "assistant.\n\n")

    from .tokenizer import build_tokenizer

    eng = BatchEngine.from_gguf(args.model, n_slots=args.parallel,
                                max_seq=args.ctx_size)
    tok = build_tokenizer(eng.vocab)
    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    queues = []
    for i in range(args.sequences):
        q = pool[int(rng.integers(len(pool)))]
        ids = tok.encode(system + f"User: {q}\nAssistant:")
        queues.append((i, q, eng.submit(
            ids, n_predict=args.n_predict,
            sampler=make_chain(temp=args.temp, seed=args.seed + i))))
    eng.run_until_idle()
    n_gen = 0
    for i, q, outq in queues:
        n = 0
        while True:
            tokid, fin = outq.get(timeout=600)
            if tokid is None:
                break
            n += 1
        n_gen += n
        print(f"seq {i:3d} | prompt: {q[:40]:40s} | generated {n} tokens")
    dt = time.perf_counter() - t0
    m = eng.metrics
    print(f"\nn_parallel = {args.parallel}, n_sequences = {args.sequences}")
    print(f"prompt tokens: {m['n_prompt_tokens']}, "
          f"generated: {m['n_tokens_generated']}")
    print(f"total time: {dt:.2f} s, "
          f"throughput: {(m['n_prompt_tokens'] + n_gen) / dt:.2f} t/s")
    return 0


def cmd_convert_llama2c(args):
    from .gguf.llama2c import convert_llama2c

    out = convert_llama2c(args.model, args.vocab, args.output)
    print(f"wrote {out}")
    return 0


def cmd_gguf_split(args):
    from .gguf.split import merge_gguf, split_gguf

    if args.merge:
        out = merge_gguf(args.input, args.output)
        print(f"merged -> {out}")
    else:
        paths = split_gguf(args.input, args.output,
                           max_tensors=args.split_max_tensors)
        print("\n".join(paths))
    return 0


def cmd_gguf_hash(args):
    from .gguf.ghash import hash_gguf

    algos = [a for a, on in (("sha256", args.sha256 or not (args.sha1 or args.uuid)),
                             ("sha1", args.sha1), ("uuid", args.uuid)) if on]
    res = hash_gguf(args.model, algos)
    for algo in algos:
        if algo == "uuid":
            print(f"UUIDv5  {res['uuid']}  {args.model}")
            continue
        table = res[algo]
        for name in table:
            if name != "__model__":
                print(f"{algo}  {table[name]}  {args.model}:{name}")
        print(f"{algo}  {table['__model__']}  {args.model}")
    return 0


def cmd_export_lora(args):
    from .models.lora import merge_lora_gguf

    out = merge_lora_gguf(args.model, args.lora, args.output,
                          scales=args.lora_scaled or None)
    print(f"wrote {out}")
    return 0


def cmd_cvector_generator(args):
    """cvector-generator analog: steering vectors from prompt pairs."""
    from .gguf import GGUFReader
    from .models.llama import load_llama_weights
    from .models.lora import write_cvector_gguf
    from .runtime.cvector import generate_control_vector
    from .tokenizer import Vocab, build_tokenizer

    with GGUFReader.open(args.model) as r:
        cfg, weights = load_llama_weights(r)
        vocab = Vocab.from_gguf(r.metadata)
    tok = build_tokenizer(vocab)
    pos = [l for l in open(args.positive_file).read().splitlines() if l.strip()]
    neg = [l for l in open(args.negative_file).read().splitlines() if l.strip()]
    n = min(len(pos), len(neg))
    dirs = generate_control_vector(
        cfg, weights, [tok.encode(p) for p in pos[:n]],
        [tok.encode(p) for p in neg[:n]], method=args.method)
    write_cvector_gguf(args.output, dirs)
    print(f"wrote {args.output}: {len(dirs)} directions")
    return 0


def cmd_quantize_stats(args):
    from .gguf import GGUFReader
    from .quant.stats import quantize_stats

    with GGUFReader.open(args.model) as r:
        rows = quantize_stats(r, args.type, include=args.include_layers,
                              exclude=args.exclude_layers,
                              per_layer=args.per_layer)
    for s in rows:
        print(f"{s.qtype:8s} {s.name:40s} rmse {s.rmse:.6f} "
              f"max {s.max_err:.6f} mean|e| {s.mean_abs:.6f}")
    return 0


def cmd_gbnf_validator(args):
    """gbnf-validator analog: parse a grammar, check an input string."""
    from .runtime.grammar import GBNFParser

    try:
        g = GBNFParser(open(args.grammar).read()).parse()
    except Exception as e:
        print(f"grammar parse error: {e}", file=sys.stderr)
        return 1
    text = open(args.input).read() if args.input else sys.stdin.read()
    for i, ch in enumerate(text):
        if not g.accept_char(ord(ch)):
            print(f"input invalid at offset {i} (char {ch!r})")
            return 1
    if not g.can_end:
        print("input is a valid prefix but incomplete")
        return 1
    print("input valid")
    return 0


def cmd_quantize(args):
    from .gguf import GGUFReader
    from .quant.policy import FTYPES, quantize_model
    from .runtime.evaluate import IMatrixCollector

    if args.ftype not in FTYPES:
        print(f"unknown ftype {args.ftype}; choices: {sorted(FTYPES)}", file=sys.stderr)
        return 1
    imatrix = IMatrixCollector.load(args.imatrix) if args.imatrix else None

    def progress(name, ttype):
        print(f"  {name} -> {ttype.name}", file=sys.stderr)

    with GGUFReader.open(args.input) as r:
        quantize_model(r, args.output, args.ftype, imatrix=imatrix, progress=progress)
    print(f"wrote {args.output}")
    return 0



def cmd_finetune(args):
    """Finetune a GGUF model on a text corpus: LoRA (default) or full-
    weight AdamW (--full, the complete ggml-opt analog)."""
    import numpy as np

    from .gguf import GGUFReader
    from .models.llama import load_llama_weights
    from .tokenizer import Vocab, build_tokenizer

    with GGUFReader.open(args.model) as r:
        cfg, weights = load_llama_weights(r)
        vocab = Vocab.from_gguf(r.metadata)
    tok = build_tokenizer(vocab)
    text = open(args.file).read()
    ids = np.asarray(tok.encode(text), np.int32)
    T = args.ctx_size
    if len(ids) < T + 1:
        print("corpus too small for ctx size", file=sys.stderr)
        return 1
    rng = np.random.default_rng(args.seed)
    if args.full:
        from .runtime.finetune import FullTrainer

        tr = FullTrainer(cfg, weights, lr=args.lr,
                         weight_decay=args.weight_decay)
    else:
        from .runtime.finetune import LoraTrainer

        tr = LoraTrainer(cfg, weights, rank=args.rank, alpha=args.alpha,
                         lr=args.lr)
    for step in range(args.steps):
        starts = rng.integers(0, len(ids) - T - 1, args.batch)
        batch = np.stack([ids[s:s + T + 1] for s in starts])
        loss = tr.step(batch)
        if step % args.log_every == 0 or step == args.steps - 1:
            print(f"step {step}: loss {loss:.4f}", flush=True)
    if args.full:
        from .quant.formats import GGMLType

        qt = getattr(GGMLType, args.out_type) if args.out_type else None
        with GGUFReader.open(args.model) as r:
            md = {k: v for k, v in r.metadata.items()
                  if k.startswith("tokenizer.")}
        tr.export_gguf(args.output, qtype=qt, metadata=md)
    else:
        tr.export_adapter(args.output)
    print(f"wrote {args.output}")
    return 0


def cmd_perplexity(args):
    import jax.numpy as jnp

    from .gguf import GGUFReader
    from .models.llama import load_llama_weights
    from .runtime.evaluate import perplexity
    from .tokenizer import Vocab, build_tokenizer

    with GGUFReader.open(args.model) as r:
        cfg, weights = load_llama_weights(r)
        vocab = Vocab.from_gguf(r.metadata)
    text = open(args.file).read() if args.file else sys.stdin.read()
    tok = build_tokenizer(vocab)
    if getattr(args, "hellaswag", False):
        from .runtime.evaluate import hellaswag

        res = hellaswag(cfg, weights, text, tok,
                        n_tasks=args.hellaswag_tasks,
                        progress=lambda r: print(
                            f"{r.n_done}\t{100*r.acc:.8f}", file=sys.stderr))
        print(json.dumps({"hellaswag_acc": res.acc, "sigma": res.sigma,
                          "tasks": res.n_done}))
        return 0
    if getattr(args, "winogrande", False):
        from .runtime.evaluate import winogrande

        res = winogrande(cfg, weights, text, tok,
                         n_tasks=args.winogrande_tasks,
                         progress=lambda r: print(
                             f"{r.n_done}\t{100*r.acc:.4f}", file=sys.stderr))
        print(json.dumps({"winogrande_acc": res.acc, "sigma": res.sigma,
                          "tasks": res.n_done}))
        return 0
    if getattr(args, "multiple_choice", False):
        from .runtime.evaluate import multiple_choice

        res = multiple_choice(cfg, weights, text, tok,
                              n_tasks=args.multiple_choice_tasks)
        print(json.dumps({"multiple_choice_acc": res.acc,
                          "sigma": res.sigma, "tasks": res.n_done}))
        return 0
    ids = tok.encode(text, add_bos=False)
    print(f"{len(ids)} tokens, n_ctx={args.ctx_size}", file=sys.stderr)

    def progress(i, n, ppl):
        print(f"[{i}/{n}] ppl={ppl:.4f}", file=sys.stderr)

    import os as _os

    import jax.numpy as _jnp

    cd = _jnp.float32 if _os.environ.get("GHT_PPL_F32") else _jnp.bfloat16
    res = perplexity(cfg, weights, ids, n_ctx=args.ctx_size,
                     bos_id=vocab.bos_id, progress=progress,
                     compute_dtype=cd)
    print(json.dumps({"ppl": res.ppl, "err": res.err, "tokens": res.nll_count}))
    return 0


def cmd_imatrix(args):
    from .gguf import GGUFReader
    from .models.llama import load_llama_weights
    from .runtime.evaluate import IMatrixCollector
    from .tokenizer import Vocab, build_tokenizer

    with GGUFReader.open(args.model) as r:
        cfg, weights = load_llama_weights(r)
        vocab = Vocab.from_gguf(r.metadata)
    text = open(args.file).read()
    ids = build_tokenizer(vocab).encode(text, add_bos=False)
    col = IMatrixCollector(cfg, weights)
    n_ctx = args.ctx_size
    chunks = len(ids) // n_ctx
    for c in range(chunks):
        col.process_chunk(ids[c * n_ctx : (c + 1) * n_ctx])
        print(f"[{c+1}/{chunks}]", file=sys.stderr)
    col.save(args.output)
    print(f"wrote {args.output} ({len(col.sums)} tensors)")
    return 0


def cmd_tokenize(args):
    from .gguf import GGUFReader
    from .tokenizer import Vocab, build_tokenizer

    with GGUFReader.open(args.model) as r:
        vocab = Vocab.from_gguf(r.metadata)
    tok = build_tokenizer(vocab)
    # reference llama-tokenize parses control tokens unless
    # --no-parse-special (examples/tokenize/tokenize.cpp:372)
    ids = tok.encode(args.text, parse_special=not args.no_parse_special)
    for i in ids:
        print(f"{i:7d} -> {vocab.tokens[i]!r}")
    return 0


def cmd_gguf_info(args):
    from .gguf import GGUFReader

    with GGUFReader.open(args.model) as r:
        print(f"version: {r.version}  alignment: {r.alignment}")
        print(f"metadata ({len(r.metadata)}):")
        for k, v in r.metadata.items():
            s = repr(v)
            print(f"  {k} = {s[:80]}{'...' if len(s) > 80 else ''}")
        print(f"tensors ({len(r.tensors)}):")
        total = 0
        for t in r.tensors.values():
            total += t.n_bytes
            print(f"  {t.name:40s} {t.ggml_type.name:6s} ne={list(t.ne)} {t.n_bytes/1e6:.2f} MB")
        print(f"total tensor bytes: {total/1e9:.3f} GB")
    return 0


def cmd_bench(args):
    """llama-bench-style sweep: pp/tg over a matrix of sizes."""
    import numpy as np

    from .runtime import Engine

    rows = []
    for m in args.model:
        eng = Engine.from_gguf(m, fuse=True,
                               max_seq=max(args.n_prompt) + max(args.n_gen) + 8)
        rng = np.random.default_rng(0)
        for pp in args.n_prompt:
            eng.reset()
            ids = rng.integers(3, eng.cfg.n_vocab - 1, size=pp)
            eng.prefill(ids[None, :])  # warm/compile
            eng.reset()
            t0 = time.perf_counter()
            eng.prefill(ids[None, :])
            dt = time.perf_counter() - t0
            rows.append({"model": m, "test": f"pp{pp}", "t/s": round(pp / dt, 2)})
        for tg in args.n_gen:
            eng.reset()
            eng.generate_ondevice([1, 2, 3], n_predict=tg, stop_at_eos=False)  # compile
            eng.reset()
            t0 = time.perf_counter()
            eng.generate_ondevice([1, 2, 3], n_predict=tg, stop_at_eos=False)
            dt = time.perf_counter() - t0
            rows.append({"model": m, "test": f"tg{tg}", "t/s": round(tg / dt, 2)})
        # batched-bench analog: parallel-sequence throughput sweep
        # (examples/batched-bench: PP/TG/PL matrix, total t/s)
        for pl in args.batch or []:
            if pl == 1:
                continue
            pp, tg = min(args.n_prompt), min(args.n_gen)
            beng = Engine.from_gguf(m, max_seq=pp + tg + 8, batch=pl)
            prompts = rng.integers(3, beng.cfg.n_vocab - 1, size=(pl, pp))

            def run_batched():
                beng.reset()
                logits = beng.prefill(prompts)
                toks = np.argmax(logits, axis=-1).astype(np.int32)
                for _ in range(tg):
                    logits = beng.decode_one(toks)
                    toks = np.argmax(logits, axis=-1).astype(np.int32)

            run_batched()  # warm/compile
            t0 = time.perf_counter()
            run_batched()
            dt = time.perf_counter() - t0
            total = pl * (pp + tg)
            rows.append({"model": m, "test": f"pp{pp}+tg{tg}@pl{pl}",
                         "t/s": round(total / dt, 2)})
    if args.output == "json":
        print(json.dumps(rows, indent=2))
    else:  # markdown
        print("| model | test | t/s |")
        print("| --- | --- | --- |")
        for r in rows:
            print(f"| {r['model']} | {r['test']} | {r['t/s']} |")
    return 0


def cmd_chat(args):
    """simple-chat / llama-cli conversation-mode analog: a stdin REPL that
    applies the model's chat template per turn and reuses the KV prefix."""
    from .gguf import GGUFReader
    from .runtime import Engine, make_chain
    from .runtime.chat import apply_chat_template, template_from_gguf

    with GGUFReader.open(args.model) as r:
        tmpl, tmpl_src = template_from_gguf(r.metadata)
    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size)
    messages = []
    if args.system:
        messages.append({"role": "system", "content": args.system})
    print("chat started; empty line or EOF exits", file=sys.stderr)
    while True:
        try:
            line = input("> ")
        except EOFError:
            break
        if not line.strip():
            break
        messages.append({"role": "user", "content": line})
        prompt = apply_chat_template(messages, tmpl, add_assistant=True,
                                     jinja_source=tmpl_src)
        ids = eng.tokenizer.encode(prompt)
        chain = make_chain(temp=args.temp, seed=args.seed)
        toks = []
        # longest-prefix KV reuse across turns (server prompt-cache style)
        for t in eng.generate(ids, n_predict=args.n_predict, sampler=chain,
                              reuse_cache=True):
            toks.append(t)
            sys.stdout.write(eng.tokenizer.decode([t], skip_special=False))
            sys.stdout.flush()
        print()
        messages.append({"role": "assistant",
                         "content": eng.tokenizer.decode(toks)})
    return 0


def cmd_convert_legacy(args):
    """convert_llama_ggml_to_gguf analog: pre-GGUF llama files -> GGUF."""
    from .gguf.legacy import convert_ggml_to_gguf

    print(convert_ggml_to_gguf(args.input, args.output))
    return 0


def cmd_gen_docs(args):
    """gen-docs analog: emit markdown docs for every subcommand."""
    p = build_parser()
    sub_actions = [a for a in p._actions
                   if isinstance(a, argparse._SubParsersAction)]
    lines = ["# CLI reference", "",
             "Generated by `gen-docs` (the reference's examples/gen-docs "
             "analog).", ""]
    for name, sp in sorted(sub_actions[0].choices.items()):
        lines.append(f"## {name}")
        lines.append("")
        lines.append("```")
        lines.append(sp.format_help().rstrip())
        lines.append("```")
        lines.append("")
    text = "\n".join(lines)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"wrote {args.output}")
    else:
        print(text)
    return 0


def build_parser():
    p = argparse.ArgumentParser(prog="ggml_hexagon_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="generate text from a prompt")
    g.add_argument("-m", "--model", required=True)
    g.add_argument("-p", "--prompt")
    g.add_argument("--prompt-tokens", help="raw token ids, e.g. '1,2,3'")
    g.add_argument("-n", "--n-predict", type=int, default=64)
    g.add_argument("-c", "--ctx-size", type=int, default=2048)
    g.add_argument("--temp", type=float, default=0.8)
    g.add_argument("--top-k", type=int, default=40)
    g.add_argument("--top-p", type=float, default=0.95)
    g.add_argument("--min-p", type=float, default=0.05)
    g.add_argument("--repeat-penalty", type=float, default=1.0)
    g.add_argument("--repeat-last-n", type=int, default=64)
    g.add_argument("-s", "--seed", type=int, default=42)
    g.add_argument("--stream", action="store_true")
    g.add_argument("--lookahead", action="store_true",
                   help="Jacobi lookahead decoding (no draft model)")
    g.add_argument("--lookup", action="store_true",
                   help="n-gram lookup decoding (no draft model)")
    g.add_argument("--prompt-cache",
                   help="session file: save/restore KV across runs")
    g.add_argument("-ct", "--cache-type", default="bf16",
                   choices=["f32", "f16", "bf16", "q8_0", "q4_0"],
                   help="KV cache dtype (type_k/type_v analog)")
    g.add_argument("-md", "--draft-model",
                   help="draft model GGUF for speculative decoding")
    g.add_argument("--on-device", action="store_true",
                   help="device-side decode loop (no per-token host sync)")
    g.set_defaults(fn=cmd_generate)

    lv = sub.add_parser("llava", help="multimodal generation (model + mmproj)")
    lv.add_argument("-m", "--model", required=True)
    lv.add_argument("--mmproj", required=True)
    lv.add_argument("--image", required=True, help=".npy HxWx3 uint8 (or PIL-readable)")
    lv.add_argument("-p", "--prompt", default="<image>")
    lv.add_argument("-n", "--n-predict", type=int, default=32)
    lv.add_argument("-c", "--ctx-size", type=int, default=2048)
    lv.add_argument("--temp", type=float, default=0.0)
    lv.add_argument("--seed", type=int, default=42)
    lv.set_defaults(fn=cmd_llava)

    ec = sub.add_parser("eval-callback",
                        help="dump every tapped tensor for one eval")
    ec.add_argument("-m", "--model", required=True)
    ec.add_argument("-p", "--prompt", default="hello world")
    ec.add_argument("--n-values", type=int, default=4)
    ec.set_defaults(fn=cmd_eval_callback)

    em = sub.add_parser("embedding", help="pooled prompt embeddings")
    em.add_argument("-m", "--model", required=True)
    em.add_argument("-p", "--prompt", action="append")
    em.add_argument("--pooling", default="mean",
                    choices=["mean", "cls", "last", "none"])
    em.add_argument("--no-normalize", action="store_true")
    em.add_argument("--n-print", type=int, default=8)
    em.set_defaults(fn=cmd_embedding)

    rt = sub.add_parser("retrieval", help="embed file chunks, rank vs query")
    rt.add_argument("-m", "--model", required=True)
    rt.add_argument("--files", nargs="+", required=True)
    rt.add_argument("--query", required=True)
    rt.add_argument("--chunk-size", type=int, default=64)
    rt.add_argument("--separator", default="\n")
    rt.add_argument("--top-k", type=int, default=3)
    rt.add_argument("--pooling", default="mean")
    rt.set_defaults(fn=cmd_retrieval)

    pk = sub.add_parser("passkey", help="long-context retrieval smoke test")
    pk.add_argument("-m", "--model", required=True)
    pk.add_argument("--n-junk", type=int, default=250)
    pk.add_argument("--passkey", type=int, default=42)
    pk.add_argument("--pos", type=int, default=-1)
    pk.add_argument("-n", "--n-predict", type=int, default=16)
    pk.add_argument("-c", "--ctx-size", type=int, default=8192)
    pk.add_argument("--grp-attn-n", type=int, default=1,
                    help="self-extend group factor (main.cpp --grp-attn-n)")
    pk.add_argument("--grp-attn-w", type=int, default=512,
                    help="self-extend window (main.cpp --grp-attn-w)")
    pk.set_defaults(fn=cmd_passkey)

    sl = sub.add_parser("save-load-state", help="state round-trip check")
    sl.add_argument("-m", "--model", required=True)
    sl.add_argument("-p", "--prompt", default="The quick brown fox")
    sl.add_argument("-n", "--n-predict", type=int, default=8)
    sl.add_argument("-c", "--ctx-size", type=int, default=512)
    sl.add_argument("-o", "--output")
    sl.set_defaults(fn=cmd_save_load_state)

    inf = sub.add_parser("infill", help="fill-in-middle completion")
    inf.add_argument("-m", "--model", required=True)
    inf.add_argument("--in-prefix", required=True)
    inf.add_argument("--in-suffix", required=True)
    inf.add_argument("-n", "--n-predict", type=int, default=32)
    inf.add_argument("-c", "--ctx-size", type=int, default=2048)
    inf.add_argument("--temp", type=float, default=0.0)
    inf.add_argument("--seed", type=int, default=0)
    inf.set_defaults(fn=cmd_infill)

    gs = sub.add_parser("gguf-split", help="shard or merge GGUF files")
    gs.add_argument("input")
    gs.add_argument("output")
    gs.add_argument("--merge", action="store_true")
    gs.add_argument("--split-max-tensors", type=int, default=128)
    gs.set_defaults(fn=cmd_gguf_split)

    gh = sub.add_parser("gguf-hash", help="per-tensor + model digests")
    gh.add_argument("model")
    gh.add_argument("--sha256", action="store_true")
    gh.add_argument("--sha1", action="store_true")
    gh.add_argument("--uuid", action="store_true")
    gh.set_defaults(fn=cmd_gguf_hash)

    el = sub.add_parser("export-lora", help="merge LoRA adapters into base")
    el.add_argument("-m", "--model", required=True)
    el.add_argument("--lora", action="append", required=True)
    el.add_argument("--lora-scaled", action="append", type=float)
    el.add_argument("-o", "--output", required=True)
    el.set_defaults(fn=cmd_export_lora)

    cv = sub.add_parser("cvector-generator", help="steering vectors from "
                        "positive/negative prompt pairs")
    cv.add_argument("-m", "--model", required=True)
    cv.add_argument("--positive-file", required=True)
    cv.add_argument("--negative-file", required=True)
    cv.add_argument("--method", default="pca", choices=["pca", "mean"])
    cv.add_argument("-o", "--output", default="control_vector.gguf")
    cv.set_defaults(fn=cmd_cvector_generator)

    qs = sub.add_parser("quantize-stats", help="round-trip error per qtype")
    qs.add_argument("-m", "--model", required=True)
    qs.add_argument("--type", action="append", required=True,
                    help="quant type name (repeatable), e.g. Q4_K")
    qs.add_argument("-l", "--include-layers")
    qs.add_argument("-L", "--exclude-layers")
    qs.add_argument("--per-layer", action="store_true")
    qs.set_defaults(fn=cmd_quantize_stats)

    gv = sub.add_parser("gbnf-validator", help="validate input vs a grammar")
    gv.add_argument("grammar")
    gv.add_argument("input", nargs="?")
    gv.set_defaults(fn=cmd_gbnf_validator)

    ts = sub.add_parser("tts", help="text-to-speech (OuteTTS + WavTokenizer)")
    ts.add_argument("-m", "--model", help="TTC language model GGUF")
    ts.add_argument("-mv", "--vocoder", required=True,
                    help="WavTokenizer-dec GGUF")
    ts.add_argument("-p", "--prompt", help="text to speak")
    ts.add_argument("--codes", help="raw vocoder codes (skip the LM)")
    ts.add_argument("--speaker", help="speaker json file")
    ts.add_argument("-o", "--output", default="output.wav")
    ts.add_argument("-n", "--n-predict", type=int, default=768)
    ts.add_argument("-c", "--ctx-size", type=int, default=4096)
    ts.set_defaults(fn=cmd_tts)

    q = sub.add_parser("quantize", help="quantize a GGUF model")
    q.add_argument("input")
    q.add_argument("output")
    q.add_argument("ftype")
    q.add_argument("--imatrix")
    q.set_defaults(fn=cmd_quantize)

    ft = sub.add_parser("finetune",
                        help="finetune on a corpus (LoRA or --full AdamW)")
    ft.add_argument("-m", "--model", required=True)
    ft.add_argument("-f", "--file", required=True)
    ft.add_argument("-o", "--output", required=True)
    ft.add_argument("--full", action="store_true",
                    help="full-weight AdamW over dense masters (ggml-opt)")
    ft.add_argument("--steps", type=int, default=100)
    ft.add_argument("--batch", type=int, default=4)
    ft.add_argument("-c", "--ctx-size", type=int, default=128)
    ft.add_argument("--lr", type=float, default=1e-4)
    ft.add_argument("--weight-decay", type=float, default=0.01)
    ft.add_argument("--rank", type=int, default=8)
    ft.add_argument("--alpha", type=float, default=16.0)
    ft.add_argument("--out-type", help="re-quantize exported weights (--full)")
    ft.add_argument("--seed", type=int, default=0)
    ft.add_argument("--log-every", type=int, default=10)
    ft.set_defaults(fn=cmd_finetune)

    pp = sub.add_parser("perplexity",
                        help="perplexity / benchmark scoring over a file")
    pp.add_argument("-m", "--model", required=True)
    pp.add_argument("-f", "--file")
    pp.add_argument("-c", "--ctx-size", type=int, default=512)
    pp.add_argument("--hellaswag", action="store_true",
                    help="score HellaSwag acc_norm (6-line-per-task file)")
    pp.add_argument("--hellaswag-tasks", type=int, default=400)
    pp.add_argument("--winogrande", action="store_true",
                    help="score Winogrande (CSV tasks file)")
    pp.add_argument("--winogrande-tasks", type=int, default=None)
    pp.add_argument("--multiple-choice", action="store_true",
                    help="score multiple-choice JSON tasks (MMLU-class)")
    pp.add_argument("--multiple-choice-tasks", type=int, default=None)
    pp.set_defaults(fn=cmd_perplexity)

    im = sub.add_parser("imatrix", help="collect importance matrix")
    im.add_argument("-m", "--model", required=True)
    im.add_argument("-f", "--file", required=True)
    im.add_argument("-o", "--output", default="imatrix.npz")
    im.add_argument("-c", "--ctx-size", type=int, default=512)
    im.set_defaults(fn=cmd_imatrix)

    tk = sub.add_parser("tokenize", help="tokenize text")
    tk.add_argument("-m", "--model", required=True)
    tk.add_argument("--no-parse-special", action="store_true",
                    help="do not parse control tokens")
    tk.add_argument("text")
    tk.set_defaults(fn=cmd_tokenize)

    gi = sub.add_parser("gguf-info", help="inspect a GGUF file")
    gi.add_argument("model")
    gi.set_defaults(fn=cmd_gguf_info)

    b = sub.add_parser("bench", help="pp/tg throughput sweep")
    b.add_argument("-m", "--model", action="append", required=True)
    b.add_argument("-p", "--n-prompt", type=int, nargs="+", default=[512])
    b.add_argument("-n", "--n-gen", type=int, nargs="+", default=[128])
    b.add_argument("-b", "--batch", type=int, nargs="+", default=[],
                   help="parallel-sequence counts (batched-bench analog)")
    b.add_argument("-o", "--output", choices=["json", "md"], default="md")
    b.set_defaults(fn=cmd_bench)

    gd = sub.add_parser("gen-docs", help="emit markdown CLI docs")
    gd.add_argument("-o", "--output")
    gd.set_defaults(fn=cmd_gen_docs)

    ch = sub.add_parser("chat", help="interactive chat REPL")
    ch.add_argument("-m", "--model", required=True)
    ch.add_argument("--system", help="system prompt")
    ch.add_argument("-n", "--n-predict", type=int, default=256)
    ch.add_argument("-c", "--ctx-size", type=int, default=4096)
    ch.add_argument("--temp", type=float, default=0.8)
    ch.add_argument("-s", "--seed", type=int, default=42)
    ch.set_defaults(fn=cmd_chat)

    cl = sub.add_parser("convert-legacy",
                        help="legacy GGML/GGMF/GGJT file -> GGUF")
    cl.add_argument("input")
    cl.add_argument("output")
    cl.set_defaults(fn=cmd_convert_legacy)

    pa = sub.add_parser("parallel",
                        help="multi-client continuous-batching simulation")
    pa.add_argument("-m", "--model", required=True)
    pa.add_argument("-np", "--parallel", type=int, default=4,
                    help="number of slots (clients)")
    pa.add_argument("-ns", "--sequences", type=int, default=8,
                    help="total sequences to process")
    pa.add_argument("-n", "--n-predict", type=int, default=32)
    pa.add_argument("-c", "--ctx-size", type=int, default=1024)
    pa.add_argument("-f", "--file", help="newline-separated prompt pool")
    pa.add_argument("--temp", type=float, default=0.8)
    pa.add_argument("-s", "--seed", type=int, default=42)
    pa.set_defaults(fn=cmd_parallel)

    c2c = sub.add_parser("convert-llama2c",
                         help="llama2.c checkpoint + vocab -> GGUF")
    c2c.add_argument("--model", required=True, help="llama2.c model.bin")
    c2c.add_argument("--vocab", required=True,
                     help="tokenizer.bin or GGUF vocab file")
    c2c.add_argument("-o", "--output", required=True)
    c2c.set_defaults(fn=cmd_convert_llama2c)

    return p


def main(argv=None):
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin ignores the env var; the config route wins
        # (lets JAX_PLATFORMS=cpu subprocesses actually run on CPU)
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

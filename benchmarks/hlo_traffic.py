"""Per-op HBM-traffic attribution from the optimized HLO.

Compiles the flagship fwd+bwd (grads) program, walks the ENTRY
computation's instructions, and charges each top-level op (fusion / dot /
convolution / custom-call / ...) its operand + output bytes — the same
accounting cost_analysis totals, but attributable through each op's
``metadata op_name`` (which carries the jax source path, e.g.
``jit(fwd)/.../decoder/...``).  Groups and ranks, so the 16.6 GB fwd+bwd
number (benchmarks/cost_attribution.py) decomposes into model components.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hlo_traffic.py [--fwd-only]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _enable_compile_cache():
    """The JAX_COMPILATION_CACHE_DIR env var is IGNORED by this jax build
    (round-5 diagnosis, benchmarks/METHODOLOGY.md); the cache must be
    enabled through jax.config after `import jax`."""
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


BATCH = 64

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8, "u16": 2,
               "s16": 2, "f8e4m3fn": 1, "f8e5m2": 1}

SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """bytes of one shape or a tuple '(f32[2,3], bf16[4])'."""
    total = 0
    for dt, dims in SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    _enable_compile_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import _loss_fn

    cfg = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=224, log_grad_norm=False)
    vocab_size = 12000
    model = IQ(cfg, vocab_size)
    batch = {k: jax.device_put(v)
             for k, v in _example_batch(cfg, vocab_size, BATCH).items()}
    state = create_train_state(cfg, model, jax.random.key(0), batch)

    def fwd(params, st, b, rng):
        return _loss_fn(params, st, b, rng, cfg, True)[0]

    if args.fwd_only:
        fn = jax.jit(fwd)
    else:
        def grads(params, st, b, rng):
            g = jax.grad(fwd)(params, st, b, rng)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(g))
        fn = jax.jit(grads)

    txt = fn.lower(state.params, state, batch, jax.random.key(1)).compile(
    ).as_text()

    # --- parse: instruction name -> output bytes; ENTRY op list
    lines = txt.splitlines()
    out_bytes = {}
    entry = []
    in_entry = False
    inst_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\]"
        r"(?:\{[^}]*\})?)\s*([\w\-]+)\((.*)", )
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.strip() == "}":
            in_entry = False
        m = inst_re.match(ln)
        if not m:
            continue
        name, shape, opcode, rest = m.groups()
        out_bytes[name] = shape_bytes(shape)
        if in_entry:
            # operand names: %name refs in the argument list before metadata
            ops = re.findall(r"%([\w.\-]+)", rest.split(" metadata=")[0])
            mm = re.search(r'op_name="([^"]*)"', ln)
            entry.append((name, opcode, ops, mm.group(1) if mm else ""))

    # --- charge traffic per entry op
    per_op = []
    total = 0
    for name, opcode, ops, op_name in entry:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        b = out_bytes.get(name, 0) + sum(out_bytes.get(o, 0) for o in ops)
        total += b
        per_op.append((b, name, opcode, op_name))

    per_op.sort(reverse=True)
    print(f"ENTRY ops: {len(per_op)}; charged traffic: {total/1e9:.2f} GB\n")
    print(f"{'GB':>7}  {'op':<24} {'origin (op_name)'}")
    for b, name, opcode, op_name in per_op[:args.top]:
        print(f"{b/1e9:>7.3f}  {(opcode + ':' + name)[:24]:<24} "
              f"{op_name[:90]}")

    # --- grouped by top-level model component in op_name
    def component(op_name: str) -> str:
        for key in ("encoder_cnn", "context_encoder", "posterior_encoder",
                    "decoder/", "output_proj", "z_classifier", "latent",
                    "image_reconstructor", "embed", "transpose"):
            if key in op_name:
                return key.rstrip("/")
        return op_name.split("/")[-1][:30] if op_name else "(none)"

    groups = defaultdict(float)
    for b, name, opcode, op_name in per_op:
        groups[component(op_name)] += b
    print("\nby component:")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v/1e9:>7.2f} GB  {k}")


if __name__ == "__main__":
    main()

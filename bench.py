"""Benchmark: steady-state training throughput of the flagship IQ config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N, ...}

- Measures the jitted latent-phase train step (fwd+bwd+Adam, ResNet included)
  on the available accelerator, run.sh "big" config (hidden/latent 1024,
  pwffn 2048, 6 layers, 8 heads, batch 64, reference run.sh:1-10).
- ``vs_baseline`` compares against the reference stack (PyTorch, equivalent
  architecture from torch.nn primitives) executed on this host's CPU — the
  only hardware the reference stack can run on here; the result is cached in
  benchmarks/torch_baseline.json so repeat runs don't re-measure.
  (The reference repo publishes no numbers of its own — BASELINE.md.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
# Persistent compile cache path: identical programs skip the (remote)
# compiler.  NOTE (round 5, the BENCH_r04 compile_s=506.8 diagnosis): this
# jax build silently IGNORES the JAX_COMPILATION_CACHE_DIR env var — the
# config value stays None and no cache dir is ever created, so every past
# "seeded cache" was a no-op and every process paid full remote compiles.
# The cache MUST be enabled via jax.config.update (done in _enable_cache()
# below, called after `import jax`).
CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/jax_compile_cache")
BASELINE_CACHE = os.path.join(REPO, "benchmarks", "torch_baseline.json")


def _enable_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BATCH = 64
IMAGE = 224
WARMUP = 3
TIMED = 50
REPEATS = 5  # median-of-N: the TPU tunnel adds two-sided slope jitter


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _flagship_cfg():
    from blt_vqg_tpu.core.config import Config
    return Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=IMAGE,
        log_grad_norm=False)  # telemetry off in the benchmark


def _slope_time(run_k, k1: int, k2: int, repeats: int = REPEATS) -> float:
    """Seconds per unit via a two-point slope: times ``run_k(k)`` (which must
    END with a host readback of a scalar that depends on all k units) at two
    sizes and divides the difference.  The tunnel's ~35ms dispatch+readback
    round trip appears in both measurements and cancels — unlike
    block_until_ready, which this image's tunneled backend does not honor
    (it returns before device completion; verified by impossible >1 PFLOP/s
    readings without a readback).

    MEDIAN of the repeats, not min: tunnel jitter hitting the SMALL run
    inflates t(k1) and yields a bogus-LOW slope (observed: "5 ms" steps
    under the 8.4 ms compute roofline), so a min-estimator cherry-picks
    corrupted samples.  See benchmarks/METHODOLOGY.md."""
    run_k(1)  # warm
    ests = []
    for _ in range(repeats):
        t0 = time.time()
        run_k(k1)
        t1 = time.time() - t0
        t0 = time.time()
        run_k(k2)
        t2 = time.time() - t0
        ests.append((t2 - t1) / (k2 - k1))
    ests.sort()
    return max(ests[len(ests) // 2], 1e-9)


def _analytic_step_bytes(state, cfg, vocab_size: int, batch: int) -> float:
    """Analytic HBM traffic (bytes) for one fused-Adam train step.

    BENCH_r04 published ``fraction_of_bandwidth_roofline: 1.33`` — a
    physical impossibility — because it divided XLA cost-analysis
    "bytes accessed" by step time.  Cost analysis over-counts real HBM
    traffic two ways: (a) fusion operands that never leave VMEM are still
    charged, and (b) loop-invariant f32 weights are charged at 4 B/el even
    though XLA hoists the f32→bf16 convert and the compute loop streams
    bf16 (CLAUDE.md round-4b lesson).  This model instead counts every
    array at the dtype that actually crosses HBM, from the REAL train
    state (so diet knobs — bf16 mu, tied heads, frozen backbone masking —
    are reflected automatically):

      all params:        convert read 4B + bf16 write 2B (once, CSEd)
                         + fwd compute read 2B
      trainable params:  bwd dX read 2B + grad write/read 4B+4B
                         + Adam p read/write 4B+4B
      Adam moments:      read + write at their STORED dtype (mu may be bf16)
      activations:       ResNet-18 conv outputs (write+read, bf16),
                         images f32 read + bf16 write, transformer
                         [B,T,H] intermediates fwd+bwd, logits [B,T,V]
                         write/read/dlogits

    It is a *principled floor + dominant terms*, not an exact count (the
    backend's DMA/copy machinery adds real traffic this does not see), so
    the published bandwidth fraction is a LOWER bound on true occupancy.
    """
    import jax
    p_leaves = jax.tree_util.tree_leaves(state.params)
    P_all = sum(int(np.prod(x.shape)) for x in p_leaves)
    # live Adam moments — optax.MaskedNode (frozen backbone) has no array
    # leaves, so tree_leaves already yields only the trainable ones
    mu = [x for x in jax.tree_util.tree_leaves(state.opt_state.mu)
          if hasattr(x, "shape")]
    nu = [x for x in jax.tree_util.tree_leaves(state.opt_state.nu)
          if hasattr(x, "shape")]
    P_tr = sum(int(np.prod(x.shape)) for x in mu)
    moment_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                       for x in mu + nu)

    by = 0.0
    by += P_all * (4 + 2 + 2)       # convert read+write, fwd weight read
    by += P_tr * (2 + 4 + 4 + 4 + 4)  # bwd read, grad w/r, Adam p r/w
    by += 2 * moment_bytes          # Adam moments read + write

    # ResNet-18 conv/pool output element count per sample (ops/resnet.py,
    # standard stride pattern); each map is written then read once, bf16
    S = cfg.image_size
    acts = ((S // 2) ** 2 * 64              # stem conv
            + 5 * (S // 4) ** 2 * 64        # maxpool + layer1 (2×2 convs)
            + 5 * (S // 8) ** 2 * 128       # layer2 (4 convs + downsample)
            + 5 * (S // 16) ** 2 * 256      # layer3
            + 5 * (S // 32) ** 2 * 512)     # layer4
    by += batch * acts * 2 * 2
    by += batch * S * S * 3 * (4 + 2)       # images f32 read + bf16 write

    # transformer intermediates: 3 stacks (enc, posterior enc, dec) ×
    # layers × ~8 [B,T,H] arrays, fwd write+read + bwd read (coarse)
    T = max(cfg.max_q_length, cfg.max_posterior_len)
    by += 3 * cfg.num_layers * 8 * batch * T * cfg.hidden_dim * 2 * 3
    # logits [B,T,V]: write + loss read + dlogits write + bwd read, bf16
    by += batch * cfg.max_q_length * vocab_size * 2 * 4
    return by


def bench_jax() -> dict:
    import jax
    import jax.numpy as jnp
    _enable_cache()
    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import (make_decode_step, make_multi_step,
                                        make_train_step)

    cfg = _flagship_cfg()
    vocab_size = 12000  # typical VQA vocab scale
    model = IQ(cfg, vocab_size)
    batch_np = _example_batch(cfg, vocab_size, BATCH)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}

    log("jax: init params ...")
    state = create_train_state(cfg, model, jax.random.key(0), batch)
    step = make_train_step(cfg, latent_mode=True)
    step_bytes_model = _analytic_step_bytes(state, cfg, vocab_size, BATCH)

    log("jax: compiling train step ...")
    t0 = time.time()
    state, m = step(state, batch, jax.random.key(1))
    _ = float(m["loss"])
    compile_s = time.time() - t0

    # XLA's own cost analysis of the compiled step → roofline/MFU fields
    # (the defensible per-chip numbers; see benchmarks/METHODOLOGY.md)
    try:
        ca = step.lower(state, batch, jax.random.key(1)).compile(
        ).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        step_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - cost analysis is best-effort
        log("cost_analysis unavailable:", e)
        step_flops = step_bytes = 0.0

    # donated state threads through every timed section via this holder
    # (donation invalidates the buffers a name pointed to before the call)
    S = {"s": state}
    del state

    # ---- single-dispatch train loop (the Trainer's steps_per_dispatch=1
    # path): steady-state seconds/step of a pipelined dispatch stream,
    # readback-synchronized
    def run_train(k):
        s = S["s"]
        for i in range(k):
            s, mm = step(s, batch, jax.random.key(i))
        S["s"] = s
        return float(mm["loss"])

    sec = _slope_time(run_train, 5, 25)
    train_sps_single = BATCH / sec
    step_ms = 1000 * sec

    # ---- production train loop (Trainer steps_per_dispatch>1, the
    # headline): G steps per jitted lax.scan dispatch.  G DISTINCT batches,
    # host-built (identical batches would make the frozen backbone
    # loop-invariant and XLA would hoist it out of the scan).
    G = 10
    multi = make_multi_step(cfg, latent_mode=True)
    rng = np.random.RandomState(1)
    stacked_np = {
        k: np.stack([v[rng.permutation(BATCH)] for _ in range(G)])
        for k, v in batch_np.items()}
    stacked_np["images"] = (stacked_np["images"]
                            + rng.rand(G, 1, 1, 1, 1).astype(np.float32)
                            * 0.01)
    stacked = {k: jax.device_put(v) for k, v in stacked_np.items()}

    def run_multi(k):
        s = S["s"]
        for i in range(k):
            s, mm = multi(s, stacked, jax.random.key(i))
        S["s"] = s
        return float(mm["loss"])

    sec = _slope_time(run_multi, 2, 7)
    train_sps = BATCH * G / sec
    del stacked
    S.clear()

    # ---- greedy decode throughput (batch questions/sec).  Headline is the
    # SERVING decode (fused-QKV KV-cache scan, no per-step top-6 probe —
    # the probe is a validation-printer aid, reference train_iq.py:189-193);
    # the probed parity decode is reported alongside.
    # NOTE: the train sections donated their state; build a fresh one.
    state = create_train_state(cfg, model, jax.random.key(0), batch)
    tok_sum = jax.jit(lambda t: jnp.sum(t))

    def time_decode(with_probe):
        dec = make_decode_step(cfg, model, latent_mode=True,
                               with_probe=with_probe)

        def run_dec(k):
            for i in range(k):
                out = dec(state, batch["images"], batch["context"],
                          jax.random.key(i))
            return float(tok_sum(out["tokens"]))

        return BATCH / _slope_time(run_dec, 3, 13)

    decode_qps = time_decode(with_probe=False)
    decode_qps_probe = time_decode(with_probe=True)

    # ---- streaming decode: whole decoder stack in ONE Pallas kernel,
    # weights/KV-cache pipelined HBM->VMEM (ops/pallas/decode_stream.py) —
    # the LATENCY play for small-batch serving (the params are identical,
    # only the decode program changes)
    cfg_stream = cfg.replace(use_stream_decode=True)
    model_stream = IQ(cfg_stream, vocab_size)
    dec_stream = make_decode_step(cfg_stream, model_stream, latent_mode=True,
                                  with_probe=False)

    def run_stream(k):
        for i in range(k):
            out = dec_stream(state, batch["images"], batch["context"],
                             jax.random.key(i))
        return float(tok_sum(out["tokens"]))

    decode_qps_stream = BATCH / _slope_time(run_stream, 3, 13)

    # ---- stream + int8 fused head: the measured-best serving config —
    # bf16 stack, the [D, V] output head streamed int8 through the fused
    # final-LN+projection+argmax kernel (ops/pallas/decode_head.py;
    # stream_fused_head="auto" engages it for int8 heads)
    cfg_h8 = cfg.replace(use_stream_decode=True, stream_head_dtype="int8")
    model_h8 = IQ(cfg_h8, vocab_size)
    dec_h8 = make_decode_step(cfg_h8, model_h8, latent_mode=True,
                              with_probe=False)

    def run_h8(k):
        for i in range(k):
            out = dec_h8(state, batch["images"], batch["context"],
                         jax.random.key(i))
        return float(tok_sum(out["tokens"]))

    decode_qps_stream_h8 = BATCH / _slope_time(run_h8, 3, 13)

    # ---- int8 weight streaming: same kernel, stacked weights quantized
    # (per-column scales) and dequantized in VMEM per stage — half the
    # weight-DMA floor (serving knob with a quantization-accuracy cost;
    # accuracy measured by benchmarks/eval_stream_int8.py).  The fused
    # int8 head auto-engages here too.
    cfg_s8 = cfg.replace(use_stream_decode=True, stream_weight_dtype="int8")
    model_s8 = IQ(cfg_s8, vocab_size)
    dec_s8 = make_decode_step(cfg_s8, model_s8, latent_mode=True,
                              with_probe=False)

    def run_s8(k):
        for i in range(k):
            out = dec_s8(state, batch["images"], batch["context"],
                         jax.random.key(i))
        return float(tok_sum(out["tokens"]))

    decode_qps_stream_int8 = BATCH / _slope_time(run_s8, 3, 13)

    # ---- stream int8 @ batch 128: the measured-best THROUGHPUT serving
    # config (round 4d) — b128 amortizes the weight stream 2× while the
    # kernel still fits scoped VMEM (b256 exceeds the 16 MB limit by
    # 1.7 MB: the stacked K/V outputs alone are ~6.5 MB there).  Params
    # are batch-independent; only the inputs change shape.
    b128 = 128
    batch128 = {k: jax.device_put(v)
                for k, v in _example_batch(cfg, vocab_size, b128).items()}

    def run_s8_128(k):
        for i in range(k):
            out = dec_s8(state, batch128["images"], batch128["context"],
                         jax.random.key(i))
        return float(tok_sum(out["tokens"]))

    decode_qps_stream_int8_b128 = b128 / _slope_time(run_s8_128, 3, 13)
    del batch128

    # ---- serving-throughput decode: the decode chain is LATENCY-bound
    # (benchmarks/METHODOLOGY.md), so a bigger batch amortizes it —
    # batch 512 is the throughput-serving configuration
    dec_b = 512
    cfg_dec = cfg.replace(batch_size=dec_b)
    model_dec = IQ(cfg_dec, vocab_size)
    batch_dec = {k: jax.device_put(v) for k, v in
                 _example_batch(cfg_dec, vocab_size, dec_b).items()}
    state_dec = create_train_state(cfg_dec, model_dec, jax.random.key(0),
                                   batch_dec)
    dec512 = make_decode_step(cfg_dec, model_dec, latent_mode=True,
                              with_probe=False)

    def run_dec512(k):
        for i in range(k):
            out = dec512(state_dec, batch_dec["images"],
                         batch_dec["context"], jax.random.key(i))
        return float(tok_sum(out["tokens"]))

    decode_qps_512 = dec_b / _slope_time(run_dec512, 2, 7)
    del state_dec, batch_dec

    # ---- throughput-config scaling point (batch 64 leaves the MXU partly
    # idle at this model size; batch 256 is the serving/training sweet spot)
    big_b = 256
    cfg256 = cfg.replace(batch_size=big_b)
    model256 = IQ(cfg256, vocab_size)
    batch256 = {k: jax.device_put(v)
                for k, v in _example_batch(cfg256, vocab_size, big_b).items()}
    state256 = create_train_state(cfg256, model256, jax.random.key(0),
                                  batch256)
    step256 = make_train_step(cfg256, latent_mode=True)

    def run_256(k, st=[state256]):
        s = st[0]
        for i in range(k):
            s, mm = step256(s, batch256, jax.random.key(i))
        st[0] = s
        return float(mm["loss"])

    train_sps_256 = big_b / _slope_time(run_256, 3, 13)
    del state256, batch256

    # ---- production-diet train step: the bandwidth-diet knobs that are
    # off by default for reference parity (tie_output_z shares the
    # [hidden, vocab] head; bf16 Adam first moments halve mu traffic) —
    # the step is HBM-bandwidth-bound (benchmarks/METHODOLOGY.md), so
    # byte-diet translates directly to step time
    cfg_diet = cfg.replace(tie_output_z=True, adam_mu_dtype="bfloat16")
    model_diet = IQ(cfg_diet, vocab_size)
    state_diet = create_train_state(cfg_diet, model_diet, jax.random.key(0),
                                    batch)
    multi_diet = make_multi_step(cfg_diet, latent_mode=True)
    stacked = {k: jax.device_put(v) for k, v in stacked_np.items()}

    def run_diet(k, st=[state_diet]):
        s = st[0]
        for i in range(k):
            s, mm = multi_diet(s, stacked, jax.random.key(i))
        st[0] = s
        return float(mm["loss"])

    train_sps_diet = BATCH * G / _slope_time(run_diet, 2, 7)

    # ---- diet v2 (round 5): + Adafactor-style factored second moment
    # (--adam_factored_nu) — removes ~1.9 GB/step more from the fused
    # update, which attribution_r5 measured AT its bandwidth floor
    # (10.0 ms of the 24.6 ms step); like the other diet knobs this
    # changes optimizer numerics and is off by default
    cfg_diet2 = cfg_diet.replace(adam_factored_nu=True)
    model_diet2 = IQ(cfg_diet2, vocab_size)
    state_diet2 = create_train_state(cfg_diet2, model_diet2,
                                     jax.random.key(0), batch)
    multi_diet2 = make_multi_step(cfg_diet2, latent_mode=True)

    def run_diet2(k, st=[state_diet2]):
        s = st[0]
        for i in range(k):
            s, mm = multi_diet2(s, stacked, jax.random.key(i))
        st[0] = s
        return float(mm["loss"])

    train_sps_diet2 = BATCH * G / _slope_time(run_diet2, 2, 7)
    del stacked

    platform = jax.devices()[0].platform
    log(f"jax[{platform}]: {train_sps:.1f} samples/s train (b64), "
        f"{train_sps_diet:.1f} diet, {train_sps_diet2:.1f} diet-v2, "
        f"{train_sps_256:.1f} (b256), {decode_qps:.1f} q/s serving decode "
        f"({decode_qps_stream:.1f} stream-kernel, "
        f"{decode_qps_stream_h8:.1f} stream+int8-head, "
        f"{decode_qps_stream_int8:.1f} stream-int8, "
        f"{decode_qps_stream_int8_b128:.1f} stream-int8@b128, "
        f"{decode_qps_probe:.1f} "
        f"probed, {decode_qps_512:.1f} @b512), "
        f"compile {compile_s:.1f}s")
    return {"train_sps": train_sps, "train_sps_single": train_sps_single,
            "train_sps_256": train_sps_256, "train_sps_diet": train_sps_diet,
            "train_sps_diet2": train_sps_diet2,
            "decode_qps": decode_qps, "decode_qps_probe": decode_qps_probe,
            "decode_qps_512": decode_qps_512,
            "decode_qps_stream": decode_qps_stream,
            "decode_qps_stream_h8": decode_qps_stream_h8,
            "decode_qps_stream_int8": decode_qps_stream_int8,
            "decode_qps_stream_int8_b128": decode_qps_stream_int8_b128,
            "platform": platform, "compile_s": compile_s,
            "step_ms": step_ms,
            "step_flops": step_flops, "step_bytes": step_bytes,
            "step_bytes_model": step_bytes_model,
            "device_kind": jax.devices()[0].device_kind}


def bench_torch_reference() -> float:
    """Reference-stack (PyTorch) throughput on this host, equivalent model."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["train_sps"]

    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)
    H, L, FF, NH, NL, V = 1024, 1024, 2048, 8, 6, 12000

    def resnet18_torch():
        """ResNet-18 from torch.nn (torchvision is not in this image)."""
        def block(cin, cout, stride):
            down = (nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                  nn.BatchNorm2d(cout))
                    if stride != 1 or cin != cout else nn.Identity())
            return nn.ModuleDict({
                "conv1": nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
                "bn1": nn.BatchNorm2d(cout),
                "conv2": nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
                "bn2": nn.BatchNorm2d(cout), "down": down})

        class ResNet18(nn.Module):
            def __init__(self):
                super().__init__()
                self.stem = nn.Sequential(
                    nn.Conv2d(3, 64, 7, 2, 3, bias=False),
                    nn.BatchNorm2d(64), nn.ReLU(), nn.MaxPool2d(3, 2, 1))
                chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2),
                         (256, 512, 2)]
                self.blocks = nn.ModuleList()
                for cin, cout, s in chans:
                    self.blocks.append(block(cin, cout, s))
                    self.blocks.append(block(cout, cout, 1))
                self.fc = nn.Linear(512, H)

            def forward(self, x):
                x = self.stem(x)
                relu = nn.functional.relu
                for b in self.blocks:
                    y = relu(b["bn1"](b["conv1"](x)))
                    y = b["bn2"](b["conv2"](y))
                    x = relu(y + b["down"](x))
                return self.fc(x.mean(dim=(2, 3)))
        return ResNet18()

    class RefEquivalent(nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = resnet18_torch()
            for name, p in self.cnn.named_parameters():
                if not name.startswith("fc"):
                    p.requires_grad = False
            self.bn = nn.BatchNorm1d(H, momentum=0.01)
            self.embed = nn.Embedding(V, 300)
            self.proj = nn.Linear(300, H)
            enc_layer = nn.TransformerEncoderLayer(
                H, NH, FF, batch_first=True, norm_first=True)
            self.encoder = nn.TransformerEncoder(enc_layer, NL)
            self.r_encoder = nn.TransformerEncoder(enc_layer, NL)
            dec_layer = nn.TransformerDecoderLayer(
                H, NH, FF, batch_first=True, norm_first=True)
            self.decoder = nn.TransformerDecoder(dec_layer, NL)
            self.prior = nn.Sequential(
                nn.Linear(H, 2 * L), nn.ReLU(), nn.Linear(2 * L, 2 * L),
                nn.ReLU(), nn.Linear(2 * L, 2 * L))
            self.posterior = nn.Sequential(
                nn.Linear(2 * H, 2 * L), nn.ReLU(), nn.Linear(2 * L, 2 * L),
                nn.ReLU(), nn.Linear(2 * L, 2 * L))
            self.zproj = nn.Linear(L, H)
            self.out = nn.Linear(H, V)
            self.zcls = nn.Linear(H, V)
            self.recon = nn.Sequential(
                nn.Linear(H, FF), nn.ReLU(), nn.Linear(FF, H))

        def forward(self, img, ctx, post, tgt):
            feat = self.bn(self.cnn(img))
            e = self.encoder(self.proj(self.embed(ctx)))
            e = torch.cat([(e[:, 0] + feat).unsqueeze(1), e[:, 1:]], 1)
            r = self.r_encoder(self.proj(self.embed(post)))
            ml_p = self.prior(e[:, 0])
            ml_q = self.posterior(torch.cat([r[:, 0], e[:, 0]], -1))
            mq, lq = ml_q[:, :L], ml_q[:, L:]
            mp, lp = ml_p[:, :L], ml_p[:, L:]
            z = torch.randn_like(mq) * torch.exp(0.5 * lq) + mq
            kld = (-0.5 * (1 + lq - lp - (mp - mq) ** 2 / lp.exp()
                           - lq.exp() / lp.exp()).sum(-1)).mean()
            zp = self.zproj(z)
            t = self.proj(self.embed(tgt))
            t = torch.cat([(t[:, 0] + feat + zp).unsqueeze(1), t[:, 1:]], 1)
            mask = nn.Transformer.generate_square_subsequent_mask(t.size(1))
            d = self.decoder(t, e, tgt_mask=mask)
            logits = self.out(d)
            aux = self.zcls(zp + feat)
            rec_img = self.recon(e[:, 0] + zp)
            return logits, aux, kld, feat, rec_img

    model = RefEquivalent()
    opt = torch.optim.Adam(
        [p for p in model.parameters() if p.requires_grad], lr=3e-5)
    ce = nn.CrossEntropyLoss(ignore_index=0)
    mse = nn.MSELoss()
    rng = np.random.RandomState(0)
    # CPU torch is slow on batch 64 — measure a smaller batch, report /sample
    tb = 16
    img = torch.from_numpy(rng.rand(tb, 3, IMAGE, IMAGE).astype(np.float32))
    ctx = torch.from_numpy(rng.randint(1, V, (tb, 3)).astype(np.int64))
    post = torch.from_numpy(rng.randint(1, V, (tb, 21)).astype(np.int64))
    tgt = torch.from_numpy(rng.randint(1, V, (tb, 20)).astype(np.int64))

    def step():
        opt.zero_grad()
        logits, aux, kld, feat, rec_img = model(img, ctx, post, tgt)
        loss = (ce(logits.reshape(-1, V), tgt.reshape(-1))
                + 0.5 * kld
                + ce(aux.unsqueeze(1).expand(-1, tgt.size(1), -1)
                     .reshape(-1, V), tgt.reshape(-1))
                + 0.1 * mse(rec_img, feat.detach()))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()

    log("torch-cpu: warmup ...")
    step()
    n = 3
    t0 = time.time()
    for _ in range(n):
        step()
    sps = tb * n / (time.time() - t0)
    log(f"torch-cpu: {sps:.2f} samples/s")
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"train_sps": sps, "batch": tb, "threads":
                   torch.get_num_threads()}, f)
    return sps


# peak specs by TPU generation (bf16 MXU FLOP/s, HBM bytes/s) — used for
# the roofline/MFU fields; sustained-achievable compute is ~80% of peak on
# this chip (benchmarks/METHODOLOGY.md: 157 TF/s measured on chained GEMMs)
_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6e": (918e12, 1640e9),
}


def _probe_device(timeout_s: int = 240) -> bool:
    """Check the accelerator actually answers before committing to the run.

    The tunneled backend makes ``jax.devices()`` HANG (not fail) when the
    relay is down — observed as a multi-hour outage mid round 3 — and a
    hung bench records nothing.  Probe in a SUBPROCESS with a timeout so
    the main process can still emit an honest one-line JSON failure.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print(jax.numpy.add(1, 1)); print(d[0].device_kind)"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # The tunnel flickers: a single failed probe does not mean a dead
    # backend (observed up->down->up within minutes).  Retry a few times
    # before recording the honest null line.
    for attempt in range(3):
        if _probe_device():
            break
        log(f"device probe attempt {attempt + 1}/3 timed out")
        if attempt < 2:
            time.sleep(60)
    else:
        print(json.dumps({
            "metric": "iq_big_train_samples_per_sec", "value": None,
            "unit": "samples/sec", "vs_baseline": None,
            "error": "accelerator unreachable (3 device probes timed out "
                     "over ~10-14 min — tunnel/relay down); rerun when the "
                     "backend recovers",
        }))
        return
    jx = bench_jax()
    try:
        baseline_sps = bench_torch_reference()
    except Exception as e:  # keep the primary metric even if torch fails
        log("torch baseline failed:", e)
        baseline_sps = None
    vs = (jx["train_sps"] / baseline_sps) if baseline_sps else 1.0

    # roofline / MFU from XLA cost analysis + the measured single-dispatch
    # step time (the defensible per-chip efficiency numbers)
    peak_flops, peak_bw = _PEAKS.get(jx.get("device_kind", ""), (None, None))
    step_s = jx["step_ms"] / 1000.0
    flops_per_sec = jx["step_flops"] / step_s if jx["step_flops"] else None
    roofline = {}
    if flops_per_sec and peak_flops:
        # bandwidth fraction uses the ANALYTIC byte model (_analytic_step_
        # bytes): XLA cost-analysis bytes count VMEM-resident fusion
        # operands and f32 weights whose loop-hoisted bf16 converts XLA
        # already streams — BENCH_r04's 1.33 "fraction of roofline" was
        # physically impossible.  The raw cost-analysis number is kept
        # alongside, explicitly labeled as an overcount.
        roofline = {
            "model_flops_per_step": round(jx["step_flops"]),
            "hbm_bytes_per_step": round(jx["step_bytes_model"]),
            "hbm_bytes_per_step_xla_cost_analysis_overcount": round(
                jx["step_bytes"]),
            "model_flops_per_sec": round(flops_per_sec),
            "mfu": round(flops_per_sec / peak_flops, 4),
            "fraction_of_compute_roofline": round(
                flops_per_sec / (0.8 * peak_flops), 4),
            "fraction_of_bandwidth_roofline": round(
                (jx["step_bytes_model"] / step_s) / peak_bw, 4),
            "device_kind": jx["device_kind"],
        }

    print(json.dumps({
        "metric": "iq_big_train_samples_per_sec",
        "value": round(jx["train_sps"], 2),
        "unit": "samples/sec",
        # kept for the driver contract; this ratio is TPU-chip vs HOST-CPU
        # torch (no GPU exists here) — NOT a per-chip-class comparison.
        # The defensible efficiency numbers are the roofline fields below.
        "vs_baseline": round(vs, 2),
        "vs_baseline_kind": "vs_host_cpu_torch (apples-to-oranges: the "
        "reference stack can only run on this host's CPU — BASELINE.md)",
        "baseline": "reference-equivalent PyTorch on host CPU (samples/sec)",
        "baseline_value": round(baseline_sps, 2) if baseline_sps else None,
        **roofline,
        "platform": jx["platform"],
        "step_ms": round(jx["step_ms"], 2),
        "train_samples_per_sec_single_dispatch": round(jx["train_sps_single"], 2),
        "train_samples_per_sec_batch256": round(jx["train_sps_256"], 2),
        "train_samples_per_sec_diet": round(jx["train_sps_diet"], 2),
        "train_samples_per_sec_diet_v2_factored_nu": round(
            jx["train_sps_diet2"], 2),
        "decode_questions_per_sec": round(jx["decode_qps"], 2),
        "decode_questions_per_sec_probed": round(jx["decode_qps_probe"], 2),
        "decode_questions_per_sec_batch512": round(jx["decode_qps_512"], 2),
        "decode_questions_per_sec_stream_kernel": round(
            jx["decode_qps_stream"], 2),
        "decode_questions_per_sec_stream_h8": round(
            jx["decode_qps_stream_h8"], 2),
        "decode_questions_per_sec_stream_int8": round(
            jx["decode_qps_stream_int8"], 2),
        "decode_questions_per_sec_stream_int8_b128": round(
            jx["decode_qps_stream_int8_b128"], 2),
        "compile_s": round(jx["compile_s"], 1),
        "methodology": "readback-synchronized two-point slope (this box's "
        "tunneled backend returns from block_until_ready before device "
        "completion, so BENCH_r01-style timed loops measured dispatch "
        "enqueue rate, not device throughput — see benchmarks/METHODOLOGY.md"
        "; r01 numbers are not comparable)",
    }))


if __name__ == "__main__":
    main()

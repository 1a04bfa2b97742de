"""Benchmark: TP-GAN frontalization synthesis throughput, imgs/sec/chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline",
"mode", "modes"} after EVERY completed measurement (the consumer parses
the last line), so a partial run under an external timeout still reports
everything measured so far; modes are skipped when the soft
``--time-budget`` would be exceeded.

* value: our full-size two-pathway Generator (bfloat16, jitted, NHWC) on
  the default JAX device (the TPU chip under the driver), best over a
  small batch sweep, steady-state, block_until_ready-bracketed.
* vs_baseline: ratio against a PyTorch implementation of the same
  reference architecture (D_and_G_model.py graph, float32, eval mode)
  measured on this host's best torch device — the closest available
  stand-in for the reference GPU path (the reference publishes no
  numbers, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_START = time.monotonic()

# Honour an explicit JAX_PLATFORMS request: this host's sitecustomize
# force-registers the tunneled-TPU plugin via jax.config, which silently
# overrides the env var — `JAX_PLATFORMS=cpu python bench.py` would
# otherwise bench (and contend with) the tunnel (same workaround as
# cli.py / __graft_entry__.py / tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
_BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts",
    "bench_baseline_torch.json",
)


def _bench_batch(b: int):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    return {
        "img": jnp.asarray(rng.randn(b, 128, 128, 3).astype(np.float32)),
        "left_eye": jnp.asarray(rng.randn(b, 40, 40, 3).astype(np.float32)),
        "right_eye": jnp.asarray(rng.randn(b, 40, 40, 3).astype(np.float32)),
        "nose": jnp.asarray(rng.randn(b, 32, 40, 3).astype(np.float32)),
        "mouth": jnp.asarray(rng.randn(b, 32, 48, 3).astype(np.float32)),
    }


def _parse_mode(mode: str):
    """'base+tok+tok' -> (base, opts, make_config overrides).

    Tokens: 'pad' (G.pad_channel_multiple=128), 'subpixel'
    (G.upsample_mode='subpixel'), 'bf16rescale' (int8 dequant epilogues
    in bf16). Unknown bases/tokens raise so a typo'd --modes entry fails
    loudly instead of silently benching the default config.
    """
    tokens = mode.split("+")
    base_mode, opts = tokens[0], set(tokens[1:])
    if base_mode not in ("bf16", "int8"):
        raise ValueError(f"unknown bench mode base {base_mode!r}")
    unknown = opts - {"pad", "subpixel", "bf16rescale"}
    if unknown:
        raise ValueError(f"unknown bench mode tokens {sorted(unknown)}")
    overrides = {"compute_dtype": "bfloat16", "G": {}}
    if "pad" in opts:
        overrides["G"]["pad_channel_multiple"] = 128
    if "subpixel" in opts:
        overrides["G"]["upsample_mode"] = "subpixel"
    return base_mode, opts, overrides


def bench_ours(
    batch_sizes=(256, 128), scan_len=8, repeats=3, mode="bf16",
    on_result=None,
) -> float:
    """Timing methodology (validated against the tunnel's semantics):

    * K synthesis forwards run inside ONE jitted ``lax.scan`` whose noise
      input depends on the previous step's output — the data dependence
      prevents XLA from hoisting the loop-invariant forward out of the
      scan (which would otherwise inflate throughput ~10x).
    * Only a scalar leaves the device; the wall clock brackets the
      host-visible scalar fetch, so dispatch-queue effects cannot fake
      completion (``block_until_ready`` acknowledges dispatch, not
      execution, over remoted PJRT backends).

    ``mode``: base 'bf16' (round-1 headline) or 'int8' (PTQ synthesis
    graph, ops/quant.py), composable with '+'-separated tokens:
    '+pad' (MXU channel-alignment layout, G.pad_channel_multiple=128),
    '+subpixel' (exact transposed-conv phase decomposition — identical
    params/outputs, fewer MACs; ops/blocks docstring), '+bf16rescale'
    (int8 dequantize epilogues in bf16 — the variant the round-4 probe
    measured fastest, artifacts/int8_variants_probe_r4.json).
    """
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench invocations (each driver
    # round) skip the dominant cost — the synthesis-graph compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn

    base_mode, opts, overrides = _parse_mode(mode)
    cfg = make_config(overrides)
    state, gen, _d, _gt, _dt = create_gan_state(cfg, jax.random.PRNGKey(0))

    if base_mode == "int8":
        from tpgan_tpu.ops.quant import calibrate_synthesis, make_int8_synthesize_fn

        scales = calibrate_synthesis(
            cfg, gen, state.g_params, [jax.device_get(_bench_batch(16))]
        )
        synthesize = make_int8_synthesize_fn(
            cfg, gen, scales,
            rescale_dtype=jnp.bfloat16 if "bf16rescale" in opts else None,
        )
    else:
        synthesize = make_synthesize_fn(cfg, gen)

    @jax.jit
    def scan_bench(params, batch, z0):
        def body(carry, _):
            acc, z = carry
            out = synthesize(params, batch, z)
            s = jnp.sum(out.astype(jnp.float32))
            return (acc + s, z + s * 1e-12), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), z0), None, length=scan_len
        )
        return acc

    best = 0.0
    for b in batch_sizes:
        batch = _bench_batch(b)
        z = jnp.zeros((b, 64), jnp.float32)
        float(scan_bench(state.g_params, batch, z))  # compile + warm
        dt = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(scan_bench(state.g_params, batch, z))
            dt = min(dt, time.perf_counter() - t0)
        best = max(best, b * scan_len / dt)
        if on_result is not None:
            # incremental: every finished batch size updates the headline
            # JSON line immediately (the driver parses the LAST line, so a
            # later timeout can never lose an already-measured number)
            on_result(best)
    return best


def bench_torch_reference(batch_size=2, iters=2, warmup=1) -> float:
    """Same architecture in idiomatic torch (reference graph:
    D_and_G_model.py; 75-channel fix applied as in our model), eval mode,
    on torch's best available device."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    dev = "cuda" if torch.cuda.is_available() else "cpu"

    def cba(i, o, k, s=1, p=0):
        return nn.Sequential(nn.Conv2d(i, o, k, s, p), nn.LeakyReLU(0.01))

    def res(c, k=3):
        p = (k - 1) // 2
        return nn.Sequential(cba(c, c, k, 1, p), nn.Conv2d(c, c, k, 1, p))

    class Res(nn.Module):
        def __init__(self, c, k=3):
            super().__init__()
            self.m = res(c, k)

        def forward(self, x):
            return F.leaky_relu(self.m(x) + x, 0.01)

    class Local(nn.Module):
        def __init__(self):
            super().__init__()
            ch = [64, 128, 256, 512]
            self.e = nn.ModuleList()
            cin = 3
            for i, c in enumerate(ch):
                self.e.append(
                    nn.Sequential(cba(cin, c, 3, 1 if i == 0 else 2, 1), Res(c))
                )
                cin = c
            self.d0 = nn.ConvTranspose2d(512, 256, 3, 2, 1, 1)
            self.s0 = nn.Sequential(cba(512, 256, 3, 1, 1), Res(256))
            self.d1 = nn.ConvTranspose2d(256, 128, 3, 2, 1, 1)
            self.s1 = nn.Sequential(cba(256, 128, 3, 1, 1), Res(128))
            self.d2 = nn.ConvTranspose2d(128, 64, 3, 2, 1, 1)
            self.s2 = nn.Sequential(cba(128, 64, 3, 1, 1), Res(64))
            self.head = nn.Conv2d(64, 3, 1)

        def forward(self, x):
            skips = []
            h = x
            for m in self.e:
                h = m(h)
                skips.append(h)
            h = F.relu(self.d0(h))
            h = self.s0(torch.cat([h, skips[2]], 1))
            h = F.relu(self.d1(h))
            h = self.s1(torch.cat([h, skips[1]], 1))
            f = F.relu(self.d2(h))
            h = self.s2(torch.cat([f, skips[0]], 1))
            return self.head(h), f

    class Global(nn.Module):
        def __init__(self, zdim=64):
            super().__init__()
            spec = [(3, 64, 7, 1, 3), (64, 64, 5, 2, 2), (64, 128, 3, 2, 1),
                    (128, 256, 3, 2, 1), (256, 512, 3, 2, 1)]
            self.e = nn.ModuleList(
                nn.Sequential(cba(*s), *([Res(s[1])] * (4 if i == 4 else 1)))
                for i, s in enumerate(spec)
            )
            self.fc1 = nn.Linear(512 * 8 * 8, 512)
            self.d8 = nn.ConvTranspose2d(256 + zdim, 64, 8)
            self.d32 = nn.ConvTranspose2d(64, 32, 3, 4, 0, 1)
            self.d64 = nn.ConvTranspose2d(32, 16, 3, 2, 1, 1)
            self.d128 = nn.ConvTranspose2d(16, 8, 3, 2, 1, 1)
            self.a8 = nn.Sequential(*[Res(576) for _ in range(3)])
            self.u16 = nn.ConvTranspose2d(576, 512, 3, 2, 1, 1)
            self.a16 = Res(256)
            self.e16 = nn.Sequential(Res(768), Res(768))
            self.u32 = nn.ConvTranspose2d(768, 256, 3, 2, 1, 1)
            self.a32 = Res(160)
            self.e32 = nn.Sequential(Res(416), Res(416))
            self.u64 = nn.ConvTranspose2d(416, 128, 3, 2, 1, 1)
            self.a64 = Res(80, 5)
            self.e64 = nn.Sequential(Res(208), Res(208))
            self.u128 = nn.ConvTranspose2d(208, 64, 3, 2, 1, 1)
            self.a128 = Res(75, 7)
            self.e128 = Res(64 + 75 + 64 + 3, 5)
            self.head = nn.Sequential(
                cba(206, 64, 5, 1, 2), Res(64), cba(64, 32, 3, 1, 1),
                nn.Conv2d(32, 3, 3, 1, 1),
            )

        def forward(self, x, local_img, local_feat, z):
            skips = []
            h = x
            for m in self.e:
                h = m(h)
                skips.append(h)
            fc1 = self.fc1(h.flatten(1))
            fc2 = fc1.view(-1, 256, 2).max(-1).values
            t = torch.cat([fc2, z], 1)[:, :, None, None]
            d8 = F.relu(self.d8(t))
            d32 = F.relu(self.d32(d8))
            d64 = F.relu(self.d64(d32))
            d128 = F.relu(self.d128(d64))
            h = self.a8(torch.cat([d8, skips[4]], 1))
            h = F.relu(self.u16(h))
            h = self.e16(torch.cat([h, self.a16(skips[3])], 1))
            h = F.relu(self.u32(h))
            h = self.e32(torch.cat([h, self.a32(torch.cat([d32, skips[2]], 1))], 1))
            h = F.relu(self.u64(h))
            h = self.e64(torch.cat([h, self.a64(torch.cat([d64, skips[1]], 1))], 1))
            h = F.relu(self.u128(h))
            a = self.a128(torch.cat([d128, skips[0], x], 1))
            h = self.e128(torch.cat([h, a, local_feat, local_img], 1))
            return self.head(h)

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.parts = nn.ModuleList(Local() for _ in range(4))
            self.g = Global()

        def forward(self, img, le, re, no, mo, z):
            outs = [m(p) for m, p in zip(self.parts, (le, re, no, mo))]

            def place(t, top, left):
                c = torch.zeros(
                    t.shape[0], t.shape[1], 128, 128, device=t.device
                )
                c[:, :, top : top + t.shape[2], left : left + t.shape[3]] = t
                return c

            geom = [(19, 18), (18, 65), (47, 43), (72, 40)]
            feat = torch.stack(
                [place(o[1], *g) for o, g in zip(outs, geom)]
            ).max(0).values
            fake = torch.stack(
                [place(o[0], *g) for o, g in zip(outs, geom)]
            ).max(0).values
            return self.g(img, fake, feat, z)

    torch.set_grad_enabled(False)
    model = Gen().to(dev).eval()
    b = batch_size
    args = [
        torch.randn(b, 3, 128, 128, device=dev),
        torch.randn(b, 3, 40, 40, device=dev),
        torch.randn(b, 3, 40, 40, device=dev),
        torch.randn(b, 3, 32, 40, device=dev),
        torch.randn(b, 3, 32, 48, device=dev),
        torch.randn(b, 64, device=dev),
    ]
    for _ in range(warmup):
        model(*args)
    if dev == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(iters):
        model(*args)
    if dev == "cuda":
        torch.cuda.synchronize()
    return b * iters / (time.perf_counter() - t0)


def _load_cached_baseline():
    """Torch-baseline cache: the reference-graph torch forward speed is a
    constant of this HOST (torch CPU, ~0.7 imgs/s), not of the code under
    test — measuring it inside every driver bench run burns ~30 s of the
    timeout for a number that never changes. Measured once, cached in
    artifacts/, reused thereafter (delete the file or pass
    --refresh-baseline to re-measure)."""
    try:
        with open(_BASELINE_CACHE) as f:
            rec = json.load(f)
        return float(rec["imgs_per_sec"])
    except Exception:
        return None


def _measure_and_cache_baseline():
    base = bench_torch_reference()
    try:
        os.makedirs(os.path.dirname(_BASELINE_CACHE), exist_ok=True)
        with open(_BASELINE_CACHE, "w") as f:
            json.dump(
                {"imgs_per_sec": base,
                 "note": "torch-CPU reference-graph forward on this host "
                         "(bench_torch_reference); constant of the host, "
                         "not of the code under test"},
                f,
            )
    except Exception:
        pass
    return base


def _device_available(timeout_s: float = 150.0) -> bool:
    """Bounded TPU-availability probe in a SUBPROCESS. When the tunnel
    is down, the axon PJRT client blocks forever inside C (uninterruptible
    from Python signal handlers), so probing in-process would reproduce
    round 2's failure mode: rc 124 with no JSON line ever printed
    (BENCH_r02.json). A killed subprocess costs ``timeout_s`` and lets
    main() emit a parseable error line instead."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import os, jax\n"
             "if os.environ.get('JAX_PLATFORMS'):\n"
             "    jax.config.update('jax_platforms',"
             " os.environ['JAX_PLATFORMS'])\n"
             "jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--modes", default="int8+subpixel+bf16rescale,bf16,int8",
        help="comma list of bf16|int8 bases with optional +pad/+subpixel/"
             "+bf16rescale tokens; the fastest mode becomes the headline "
             "value. The HEADLINE serving config (int8+subpixel+"
             "bf16rescale, round 4) runs FIRST so a budget squeeze trims "
             "the tail modes, never the headline — BENCH_r04.json lost "
             "the int8 number exactly this way (VERDICT r4 item 2)",
    )
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--time-budget", type=float,
        default=float(os.environ.get("TPGAN_BENCH_BUDGET", 480.0)),
        help="soft wall-clock budget (s); later modes are skipped when "
             "the remaining budget is too small, so a complete JSON line "
             "is always printed before any external timeout",
    )
    ap.add_argument("--refresh-baseline", action="store_true")
    args = ap.parse_args()

    mode_list = [m.strip() for m in args.modes.split(",") if m.strip()]
    modes = {m: None for m in mode_list}
    skipped = []
    base = None if args.refresh_baseline else _load_cached_baseline()

    def emit():
        """Print the complete headline JSON line reflecting everything
        measured SO FAR — called after every measurement so the driver's
        tail-parse always finds a valid line even if a timeout kills the
        remainder mid-mode."""
        measured = {k: v for k, v in modes.items() if v}
        if measured:
            headline_mode = max(measured, key=measured.get)
            ours = measured[headline_mode]
        else:
            headline_mode, ours = None, 0.0
        vs = (
            round(ours / base, 2)
            if base and np.isfinite(base) and ours else None
        )
        # Honest hardware framing (VERDICT r3 item 8): vs_baseline is
        # torch on THIS HOST'S CPU — the only reference execution path
        # available here — and overstates a chip-vs-chip ratio. The
        # machine-readable headline therefore also carries model FLOP
        # utilisation and the implied throughput of a perfectly-efficient
        # A100 on the same graph. FLOPs/img comes from XLA's cost model
        # on the synthesis graph (examples/roofline.py, fm=1.0 bf16):
        # 170.9 GFLOP/img; peaks: v5e 197 bf16 TFLOP/s / 394 int8 TOP/s,
        # A100 312 bf16 TFLOP/s (docs/BENCHMARKS.md roofline section).
        fpi = 170.9e9
        rec = {
            "metric": "tpgan_synthesis_imgs_per_sec_per_chip",
            "value": ours,
            "unit": "imgs/s",
            "vs_baseline": vs,
            "baseline_note": "torch-CPU on this host (host-bound; see "
                             "mfu_* for hardware-independent framing)",
            "mode": headline_mode,
            "modes": modes,
            "mfu_bf16": (
                round(modes["bf16"] * fpi / 197.0e12, 3)
                if modes.get("bf16") else None
            ),
            "mfu_int8": (
                round(modes["int8"] * fpi / 394.0e12, 3)
                if modes.get("int8") else None
            ),
            # model-FLOP MFU of whatever mode leads (int8 peak for int8
            # bases). fpi is the dilated-graph cost: for +subpixel modes
            # the executed-FLOP count is lower, so this stays the
            # *model*-FLOP convention (useful math / wall-clock), not an
            # executed-FLOP utilisation.
            "mfu_headline": (
                round(ours * fpi / (394.0e12 if headline_mode and
                                    headline_mode.startswith("int8")
                                    else 197.0e12), 3)
                if ours else None
            ),
            "est_ideal_a100_imgs_s": round(312.0e12 / fpi, 1),
        }
        if skipped:
            rec["skipped"] = skipped
        print(json.dumps(rec), flush=True)

    def remaining():
        return args.time_budget - (time.monotonic() - _START)

    # Fail-fast guard: if the device backend is unreachable (tunnel
    # down), retry briefly, then print the JSON line with an error
    # marker and exit 0 — a parseable line always beats an rc-124 hang.
    while not _device_available(min(150.0, max(30.0, remaining() / 2))):
        if remaining() < 300.0:
            skipped.append("all(device_unavailable)")
            emit()
            return 0
        print(f"# device backend unavailable; retrying "
              f"({remaining():.0f}s budget left)", file=sys.stderr)
        time.sleep(30.0)

    # Emit one valid (all-null-modes) line BEFORE the first measurement:
    # the first mode's compile+measure has no internal deadline, so on a
    # contended host an external timeout could otherwise kill the run
    # with zero output (observed when a CPU compile shared the one-core
    # host with the 19:33 r4 preflight — runs/bench_r4_preflight.out
    # came back empty). A parseable placeholder always beats silence.
    emit()

    # Per-mode cost bound (compile dominates; the persistent compile
    # cache makes repeat runs much cheaper, first runs pay ~60-150 s per
    # new XLA program). Measured mode costs feed forward: once the first
    # mode's true cost is known, use it to bound the next decision.
    mode_cost_estimate = 240.0
    first = True
    for mode in mode_list:
        if not first and remaining() < mode_cost_estimate:
            skipped.append(f"{mode}(budget)")
            print(f"# skipping mode {mode}: {remaining():.0f}s left "
                  f"< est {mode_cost_estimate:.0f}s", file=sys.stderr)
            emit()
            continue
        t0 = time.monotonic()
        # bf16 keeps the b=256+128 sweep (round-1 continuity); variants
        # bench at the winning batch size only to bound compile time.
        # b=256 runs FIRST so the earliest emitted line already carries
        # the historically-winning configuration.
        sizes = (256, 128) if mode == "bf16" else (256,)
        try:
            modes[mode] = None

            def on_result(best, _mode=mode):
                modes[_mode] = round(best, 2)
                emit()

            bench_ours(
                batch_sizes=sizes, repeats=args.repeats, mode=mode,
                on_result=on_result,
            )
        except Exception as e:  # a variant failing must not kill the bench
            print(f"# mode {mode} failed: {e!r}", file=sys.stderr)
            emit()
        mode_cost_estimate = max(60.0, time.monotonic() - t0)
        first = False

    if base is None and remaining() > 60.0:
        try:
            base = _measure_and_cache_baseline()
        except Exception as e:
            print(f"# torch baseline failed: {e!r}", file=sys.stderr)
    emit()


if __name__ == "__main__":
    sys.exit(main())

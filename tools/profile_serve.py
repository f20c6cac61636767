"""Capture + summarize a device-side profile of the serving step.

Runs a short PLMS generate under jax.profiler.trace, then aggregates the
TPU plane's "XLA Ops" events by op category / op name so optimization is
driven by measured device time, not guesses.

Usage:
  python tools/profile_serve.py [--batch 4] [--steps 10] [--outdir /tmp/prof]
  python tools/profile_serve.py --parse-only --outdir /tmp/prof
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(outdir: str, batch: int, steps: int, latent: int = 64,
            alpha=None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents

    comps = GligenComponents.create(dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    pipe = GenerationPipeline(comps)
    b = batch
    ids = np.full((b, 77), 49407, np.int32)
    ids[:, 0] = 49406
    grounding = {
        "boxes": np.zeros((b, 30, 4), np.float32),
        "masks": np.zeros((b, 30), np.float32),
        "positive_embeddings": np.zeros((b, 30, 768), np.float32),
    }
    grounding["boxes"][:, 0] = [0.1, 0.2, 0.5, 0.8]
    grounding["masks"][:, 0] = 1.0

    def run(seed):
        img = pipe.generate(
            ids, ids.copy(), grounding, steps=steps, guidance_scale=7.5,
            sampler="plms", latent_size=latent, alpha_stages=alpha,
            rng=jax.random.PRNGKey(seed),
        )
        jax.block_until_ready(img)

    run(0)  # compile
    with jax.profiler.trace(outdir):
        run(1)
    print(f"trace written to {outdir}")


# Map HLO op-name prefixes to readable buckets when no category stat exists.
_NAME_BUCKETS = [
    (re.compile(r"^(convolution|conv)"), "convolution"),
    (re.compile(r"^(dot|gemm)"), "dot"),
    (re.compile(r"^fusion"), "fusion"),
    (re.compile(r"^custom-call"), "custom-call"),
    (re.compile(r"^(copy|transpose|bitcast)"), "copy/transpose"),
    (re.compile(r"^(all-reduce|all-gather|reduce-scatter|collective)"), "collective"),
    (re.compile(r"^(dynamic-slice|dynamic-update-slice|slice|concatenate|pad|reshape)"), "data-movement"),
    (re.compile(r"^(reduce|reduce-window)"), "reduce"),
]


def parse(outdir: str, top: int = 45) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    xplanes = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        print("no xplane found under", outdir)
        sys.exit(1)
    xs = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:
        xs.ParseFromString(f.read())

    tpu = next((p for p in xs.planes if "/device:TPU" in p.name), None)
    if tpu is None:
        print("no TPU plane; planes:", [p.name for p in xs.planes])
        sys.exit(1)

    stat_names = dict(tpu.stat_metadata)  # id -> XStatMetadata
    meta = dict(tpu.event_metadata)

    def ev_stats(ev):
        out = {}
        for s in ev.stats:
            sm = stat_names.get(s.metadata_id)
            if sm is None:
                continue
            val = (
                s.str_value or s.int64_value or s.uint64_value or s.double_value
                or (s.ref_value and stat_names[s.ref_value].name)
            )
            out[sm.name] = val
        return out

    def classify(name: str) -> str:
        """Semantic buckets from the HLO line (the xplane's hlo_category
        stat is usually absent on this backend).  The metadata name holds
        the full `%op = type fusion(operands...)` text."""
        if name.startswith("%while"):
            return "(while container — excluded)"
        if name.startswith(("%attn", "%fuser", "%transformer_blocks", "%flash")):
            return "pallas attention/projection kernels"
        if "convolution" in name.split("=")[0] or re.search(r"bf16\[[357],[357],", name):
            return "conv (+fused stats/residuals)"
        if re.match(r"%\S+ = \(f32\[\d+,\d+\]", name):
            return "norm statistics"
        if name.startswith(("%add_", "%multiply_", "%divide_", "%select_", "%convert_")):
            return "elementwise fusions"
        if name.startswith(("%copy", "%reshape", "%broadcast", "%pad", "%slice", "%dynamic", "%bitcast", "%concatenate")):
            return "data movement"
        if name.startswith("%fusion"):
            return "matmul/other fusions"
        return "misc"

    by_name = collections.Counter()
    by_cat = collections.Counter()
    calls = collections.Counter()
    for line in tpu.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = meta.get(ev.metadata_id)
            name = m.name if m else "?"
            dur = ev.duration_ps / 1e12  # seconds
            by_name[name] += dur
            calls[name] += 1
            stats = ev_stats(ev)
            cat = stats.get("hlo_category") or classify(name)
            by_cat[str(cat)] += dur

    excl = by_cat.pop("(while container — excluded)", 0.0)
    total = sum(by_cat.values())
    print(f"== device time by category (total {total*1e3:.2f} ms; "
          f"while-container {excl*1e3:.0f} ms excluded to avoid double count) ==")
    for cat, t in by_cat.most_common():
        print(f"  {cat:44s} {t*1e3:9.2f} ms  {100*t/total:5.1f}%")
    print(f"\n== top {top} ops by total device time ==")
    for name, t in by_name.most_common(top):
        print(f"  {t*1e3:9.3f} ms  x{calls[name]:<5d} {name[:110]}")


def gaps(outdir: str, top: int = 40) -> None:
    """Device idle-time analysis (VERDICT r4 #1a: the ~14 ms/step
    'scheduling gaps' component).  Walks the TPU plane's leaf XLA-op
    timeline, measures the spans where the core sits idle between ops,
    and attributes each gap to the op pair around it — distinguishing
    kernel-launch bubbles (many small gaps) from layout/copy stalls
    (few big gaps around specific ops)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    xplanes = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        print("no xplane found under", outdir)
        sys.exit(1)
    xs = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tpu = next((p for p in xs.planes if "/device:TPU" in p.name), None)
    if tpu is None:
        print("no TPU plane; planes:", [p.name for p in xs.planes])
        sys.exit(1)
    meta = dict(tpu.event_metadata)

    evs = []
    for line in tpu.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = meta.get(ev.metadata_id)
            name = m.name if m else "?"
            if name.startswith("%while"):  # container: overlaps its leaves
                continue
            evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
    if not evs:
        print("no leaf ops on the XLA Ops line")
        sys.exit(1)
    evs.sort()
    span = evs[-1][1] - evs[0][0]
    busy = 0
    gap_list = []  # (gap_ps, prev_name, next_name)
    cur_end = evs[0][0]
    for start, end, name in evs:
        if start > cur_end:
            gap_list.append((start - cur_end, prev_name, name))
        busy += max(0, end - max(start, cur_end))
        if end > cur_end:
            cur_end = end
            prev_name = name
    idle = span - busy
    print(f"== device timeline: span {span/1e9:.3f} ms, busy {busy/1e9:.3f} ms, "
          f"idle {idle/1e9:.3f} ms ({100*idle/span:.1f}%) ==")
    n_g = len(gap_list)
    tot_g = sum(g for g, _, _ in gap_list)
    print(f"{n_g} gaps totaling {tot_g/1e9:.3f} ms "
          f"(mean {tot_g/max(1,n_g)/1e6:.2f} us)")

    # histogram by gap size
    import collections as _c

    hist = _c.Counter()
    hist_t = _c.Counter()
    for g, _, _ in gap_list:
        us = g / 1e6
        b = ("<1us" if us < 1 else "1-5us" if us < 5 else "5-20us"
             if us < 20 else "20-100us" if us < 100 else ">=100us")
        hist[b] += 1
        hist_t[b] += g
    for b in ("<1us", "1-5us", "5-20us", "20-100us", ">=100us"):
        if hist[b]:
            print(f"  {b:9s} x{hist[b]:<6d} {hist_t[b]/1e9:8.3f} ms")

    # attribute gap time to the FOLLOWING op (launch/prologue cost shows
    # up as idle before the op starts)
    by_next = _c.Counter()
    cnt_next = _c.Counter()
    for g, _p, nxt in gap_list:
        key = nxt.split(" = ")[0][:80]
        by_next[key] += g
        cnt_next[key] += 1
    print(f"\n== top {top} ops by idle time attributed BEFORE them ==")
    for k, t in by_next.most_common(top):
        print(f"  {t/1e9:8.3f} ms  x{cnt_next[k]:<5d} {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--latent", type=int, default=64,
                    help="latent size (128 = the 1024^2 serving point)")
    ap.add_argument("--alpha", default=None,
                    help="comma alpha stages, e.g. 0.3,0,0.7 (default: gate held at 1)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--outdir", default="/tmp/prof_serve")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--gaps", action="store_true",
                    help="device idle-time (scheduling gap) analysis")
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()
    if not args.parse_only:
        alpha = [float(x) for x in args.alpha.split(",")] if args.alpha else None
        capture(args.outdir, args.batch, args.steps, args.latent, alpha)
    parse(args.outdir, args.top)
    if args.gaps:
        gaps(args.outdir, args.top)


if __name__ == "__main__":
    main()

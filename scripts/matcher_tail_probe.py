"""Decompose the c2f matcher train step's fusion tail by DEVICE TRACE.

VERDICT r4 weak #4 / next-round item 4: the round-4 roofline attributed
~47 ms of the 103.7 ms step to "a 685-op elementwise/matmul fusion tail"
plus ~10 ms of layout copies, with no finer decomposition.  This probe
applies the render path's methodology to that bucket:

1. build the production train step (same loss body as
   scripts/matcher_roofline.py = matcher_trainer.C2FTrainStep),
2. capture a jax.profiler device trace over several steps,
3. aggregate per-op device time from the chrome-trace JSON,
4. NAME the top fusions by joining the trace op names against the
   compiled HLO text: for each hot fusion print its root instruction,
   output shape, and an op histogram of its fused computation,
5. bucket everything into categories (attention kernels / dw-conv VJP /
   convolutions / matmul fusions / elementwise fusions / copies / ...)
   so the tail's composition is explicit.

The output feeds PARITY's matcher-roofline section: which fusions are
closable (layout seams, StarReLU residual reads) and which are floor.

Run on the TPU: python scripts/matcher_tail_probe.py [--bs 2] [--steps 6]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import optax  # noqa: E402

from nerfmatch_tpu.models.attention import fused_attention_scope  # noqa: E402
from nerfmatch_tpu.models.matcher_c2f import NeRFMatcherMS  # noqa: E402
from nerfmatch_tpu.utils.cache import enable_compile_cache  # noqa: E402
from scripts.matcher_roofline import (  # noqa: E402
    make_inputs, make_loss, model_config, scalarize)

enable_compile_cache()  # persistent XLA cache: reruns start warm


def build_step(model, loss):
    opt = optax.adam(1e-4)

    @jax.jit
    def step(p, s, i):
        with fused_attention_scope(True):
            l, g = jax.value_and_grad(lambda q: loss(q, i))(p)
        up, s = opt.update(g, s, p)
        return scalarize((optax.apply_updates(p, up), s), l)

    return step, opt.init


def load_device_events(logdir: Path):
    """Load XLA-op events from the profiler's chrome trace JSON.

    Keeps ONLY the device's 'XLA Ops' thread lane: the 'XLA Modules'
    lane (whole-program jit_step events) and the 'Steps' lane (events
    named "0".."N") are containers that double-count every op and must
    be excluded (the axon v5e trace exposes lanes: XLA Ops, XLA
    Modules, Steps, TC Overlay, Scalar Unit, Async XLA Ops)."""
    paths = sorted(glob.glob(str(logdir / "**" / "*.trace.json.gz"),
                             recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # (pid, tid) -> thread lane name from metadata events
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if tnames.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        out.append((e.get("name", ""), float(e.get("dur", 0.0)),
                    dict(e.get("args") or {})))
    return out, pnames


CATS = (
    # the Pallas kernels show up under their jitted wrapper names
    ("attn-bwd (pallas)", re.compile(r"fused_bwd|mha_bwd", re.I)),
    ("attn-fwd (pallas)", re.compile(r"fused_fwd|mha_fwd", re.I)),
    ("dw-wgrad (pallas)", re.compile(r"dw_star_wgrad|sepconv.*wgrad", re.I)),
    ("dw-dgrad (pallas)", re.compile(r"dw_star_dgrad|sepconv.*dgrad", re.I)),
    ("pallas/custom", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("convolution", re.compile(r"^%?convolution")),
    ("copy/transpose", re.compile(r"^%?(copy|transpose|bitcast)")),
    ("dot/matmul", re.compile(r"^%?dot")),
    ("mult-reduce-fusion", re.compile(r"multiply_reduce_fusion")),
    ("fusion", re.compile(r"fusion")),
    ("reduce", re.compile(r"^%?reduce")),
    ("dynamic-slice/gather", re.compile(r"(dynamic.slice|gather|scatter)")),
    ("all-reduce/collective", re.compile(r"(all-reduce|collective)")),
)


def categorize(name, args):
    hlo = args.get("hlo_op") or name
    label = f"{name} {args.get('long_name', '')}"
    for cat, pat in CATS:
        if pat.search(hlo) or pat.search(label):
            return cat
    return "other"


def hlo_fusion_index(hlo_text: str):
    """Map fusion var name -> (def line, called computation op histogram,
    shape)."""
    comp_ops = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"^%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->", line.strip())
        if line and not line.startswith(" ") and "{" in line:
            m2 = re.match(r"^%?([\w.\-_]+)", line.strip())
            cur = m2.group(1) if m2 else None
            comp_ops[cur] = collections.Counter()
        elif cur and line.strip().startswith("%"):
            op = re.match(r"%[\w.\-_]+\s*=\s*\S+\s+(\w[\w\-]*)\(?",
                          line.strip())
            if op:
                comp_ops[cur][op.group(1)] += 1
    fusions = {}
    # line-wise split handles tuple shapes, whose nested parens (e.g.
    # "(f32[]{:T(128)}, ...)") defeat a \S+ or [^)]* shape regex
    for line in hlo_text.splitlines():
        s = line.strip()
        if not (s.startswith("%") and " = " in s and " fusion(" in s):
            continue
        nm = s.split(" = ")[0].lstrip("%")
        shape = s.split(" = ", 1)[1].split(" fusion(")[0]
        mc = re.search(r"calls=%?([\w.\-_]+)", s)
        fusions[nm] = (shape, mc.group(1) if mc else "?")
    return fusions, comp_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", type=str, default="/tmp/matcher_tail_trace")
    args = ap.parse_args()

    model = NeRFMatcherMS(model_config())
    params = model.init_params(jax.random.PRNGKey(0))
    inp = make_inputs(args.bs)
    loss = make_loss(model)
    step, opt_init = build_step(model, loss)
    state = opt_init(params)

    print("# compiling + warmup...", flush=True)
    np.asarray(step(params, state, inp))
    lowered = step.lower(params, state, inp).compile()
    hlo_text = lowered.as_text()
    Path("/tmp/matcher_tail_hlo.txt").write_text(hlo_text)
    fus_idx, comp_ops = hlo_fusion_index(hlo_text)
    print(f"# HLO: {len(hlo_text.splitlines())} lines, "
          f"{len(fus_idx)} fusions indexed", flush=True)

    logdir = Path(args.logdir)
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(str(logdir))
    out = None
    for _ in range(args.steps):
        out = step(params, state, inp)
    np.asarray(out)
    jax.profiler.stop_trace()

    events, lanes = load_device_events(logdir)
    per_op = collections.defaultdict(float)
    op_args = {}
    for nm, dur, a in events:
        per_op[nm] += dur
        op_args.setdefault(nm, a)
    total_us = sum(per_op.values())
    per_step_ms = total_us / args.steps / 1e3
    print(f"# device lanes: {sorted(set(lanes.values()))}")
    print(f"# total device op time: {per_step_ms:.1f} ms/step over "
          f"{args.steps} steps ({len(per_op)} distinct ops)")

    # ---- category buckets ----
    cat_ms = collections.defaultdict(float)
    for nm, us in per_op.items():
        cat_ms[categorize(nm, op_args[nm])] += us / args.steps / 1e3
    print("\n== categories (ms/step) ==")
    for cat, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:>22}: {ms:7.2f}  ({ms / per_step_ms:5.1%})")

    # ---- top ops, fusions named via HLO ----
    print(f"\n== top {args.top} ops (ms/step) ==")
    for nm, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        ms = us / args.steps / 1e3
        a = op_args[nm]
        extra = ""
        key = nm.lstrip("%")
        if key in fus_idx:
            shape, comp = fus_idx[key]
            ops = comp_ops.get(comp, {})
            hist = ",".join(f"{o}x{c}" for o, c in
                            sorted(ops.items(), key=lambda kv: -kv[1])[:6])
            extra = f" -> {shape} [{hist}]"
        elif a.get("long_name"):
            extra = f" | {a['long_name'][:110]}"
        print(f"  {ms:7.2f}  {nm[:60]}{extra}")

    json_path = Path("/tmp/matcher_tail_probe.json")
    json_path.write_text(json.dumps({
        "bs": args.bs, "steps": args.steps,
        "total_device_ms_per_step": per_step_ms,
        "categories_ms": dict(cat_ms),
        "top_ops_ms": {nm: us / args.steps / 1e3 for nm, us in
                       sorted(per_op.items(), key=lambda kv: -kv[1])[:60]},
    }, indent=1))
    print(f"\n# written {json_path}")


if __name__ == "__main__":
    main()

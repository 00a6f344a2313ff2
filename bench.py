"""Benchmark: 448x448 inference (embeddings + spherical k-means) img/s/chip.

Measures the reference's headline inference path (SURVEY.md §6 /
BASELINE.md): ResNet-50 FCN OS-8 dense embeddings at 448², L2-normalize,
and the per-image spherical k-means EM (grid 6x6, 10 iterations) — the
pipeline that pyscripts/inference.py runs per window.

`vs_baseline` divides by REFERENCE_IMG_S, the reference PyTorch pipeline
on one V100. The reference publishes no throughput, so the constant is
derived three ways (full detail: docs/DESIGN.md "Baseline derivation"):

1. Roofline: the identical computation costs ~172 GFLOPs/img fp32 (XLA
   cost analysis). The reference runs fp32 (no AMP anywhere in it); V100
   fp32 peak is 15.7 TFLOP/s and cuDNN ResNet-style convs with dilation
   reach ~30-45% of that → 27-41 img/s upper bound for the FORWARD alone.
2. The reference's EM is a serial per-image Python loop of 10 sequential
   scatter-add + argmax kernel pairs (hsg/utils/segsort/common.py:270-408),
   which batching cannot hide — so the full pipeline lands below the
   forward-only bound.
3. CPU-normalized cross-check: tools/measure_reference_baseline.py times
   an independent torch fp32 implementation of the same math against our
   JAX path on the same host CPU, isolating implementation overhead from
   hardware.

REFERENCE_IMG_S = 30 sits mid-band of (1) before subtracting (2): a
deliberately generous baseline.

Also reports achieved TFLOP/s and MFU. flops/img = FLOPS_PER_IMG below:
XLA cost analysis of this exact computation lowered for CPU gives
171.6e9 (f32) / 172.8e9 (bf16) per image (tools/measure_reference_
baseline.py --flops), consistent with the analytic count (ResNet-50 at
224²/OS-32 is ~8.2 GFLOPs; at 448² with OS-8 res4 runs at 4x and res5 at
16x their OS-32 resolution → ~170 GFLOPs + head + EM). The TPU
executable's own cost_analysis() under-reports convolutions (~17 GFLOPs/
img) and is not used. Peak FLOP/s comes from the device kind.

Timing chains ITERS dependent iterations inside one jitted scan and does a
single host readback, so the number is robust to dispatch/transfer latency
(relevant on tunneled TPU runtimes).

Also measures the TRAINING path (the workload that actually costs hours):
the exact jitted stage-1 train step at true recipe shapes (128 views
@224², coco_stage1.yaml via tools/rehearse_recipes.py) — reported as
train_ms_step / train_views_s / train_mfu extra keys.
TRAIN_FLOPS_PER_VIEW comes from XLA CPU cost analysis of that compiled
train step (5.2705e12 flops / 128 views; the TPU executable's own
cost_analysis() under-reports convs and is not used). A second training
metric (train2_*) runs the stage-2 production shape — 96 view rows
@448², all five losses, both transformers, selective res2,res3 remat
(the round-5 A/B winner) — unchained, since the scan-wrapped stage-2
compile is pathological through the TPU tunnel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

REFERENCE_IMG_S = 30.0  # derived above + docs/DESIGN.md; PyTorch ref, V100
ITERS = 10
FLOPS_PER_IMG = 172.8e9  # XLA CPU cost analysis of this pipeline, bf16
TRAIN_FLOPS_PER_VIEW = 41.18e9  # XLA CPU cost analysis, stage-1 train step
TRAIN_STEPS = 60
TRAIN_CHAIN = 10  # steps per dispatch (lax.scan) — excludes host RTT
TRAIN2_STEPS = 20  # stage-2 production-shape metric (unchained)

# bf16 matmul peak FLOP/s by device kind prefix (public specs).
PEAK_FLOPS = {
    'TPU v5 lite': 197e12,   # v5e
    'TPU v5': 459e12,        # v5p
    'TPU v4': 275e12,
    'TPU v6': 918e12,        # v6e (Trillium)
}


def _peak_for(device) -> float | None:
    kind = getattr(device, 'device_kind', '')
    for prefix, peak in sorted(PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(prefix):
            return peak
    return None


def _release_tpu():
    """Stop a live training continuation so this bench can attach.

    The tunneled TPU serves ONE client process at a time, and the
    cross-round COCO continuation (recipes/coco_resume.sh, docs/DESIGN.md
    "Full-recipe execution: COCO") may legitimately still be holding it
    when the round-end bench starts. The recipe records its trainer PID
    in /tmp/coco_s1.pid; stop exactly that PID (never pattern-matched),
    give orbax a moment to finish any in-flight snapshot write, and
    proceed. No-op when no continuation is running.
    """
    import os
    import signal

    def _unlink_pidfile():
        # The continuation supervisors (recipes/coco_guard.sh,
        # coco_finish.sh) treat a missing pidfile as "the bench owns the
        # chip now" and stand down — unlink it whenever its target is
        # not (or no longer) a live continuation job.
        try:
            os.unlink('/tmp/coco_s1.pid')
        except OSError:
            pass

    # Advertise this bench's lifetime: the supervisors wait while this
    # PID is alive before (re)launching anything on the single-client
    # tunnel, closing the unlink->relaunch race windows.
    try:
        with open('/tmp/hsg_bench.pid', 'w') as f:
            f.write(str(os.getpid()))
    except OSError:
        pass

    try:
        with open('/tmp/coco_s1.pid') as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return
    if pid <= 1 or pid == os.getpid():
        return
    try:
        os.kill(pid, 0)
    except OSError:
        _unlink_pidfile()  # already gone; stale
        return
    # Guard against PID reuse on a stale pidfile: only ever signal a
    # process that is actually the continuation trainer.
    try:
        with open(f'/proc/{pid}/cmdline', 'rb') as f:
            cmdline = f.read().decode('utf-8', 'replace')
    except OSError:
        cmdline = ''
    if 'pyscripts/' not in cmdline:
        # The continuation registers train.py AND the finish recipe's
        # prototype/inference children here (recipes/coco_finish.sh) —
        # anything else is a recycled PID. The pidfile is the
        # continuation protocol's own state, so clear it (the innocent
        # process is left untouched).
        print(f'# stale pidfile: pid {pid} is not a pyscripts job; '
              'clearing pidfile, leaving the process alone', flush=True)
        _unlink_pidfile()
        return
    print(f'# releasing TPU: stopping continuation trainer pid {pid}',
          flush=True)
    try:
        os.kill(pid, signal.SIGTERM)
    except OSError:
        _unlink_pidfile()  # died between the checks
        return
    for _ in range(60):
        time.sleep(1)
        try:
            os.kill(pid, 0)
        except OSError:
            break
    else:
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass
        time.sleep(2)
    _unlink_pidfile()  # now-stale; avoid future PID reuse
    time.sleep(3)  # let the tunnel drop the old client


def run_bench():
    """Build the full result dict (the JSON line main() prints).

    Tiny-shape env knobs (HSG_BENCH_*) let tests/test_bench_gate.py
    execute this exact flow on CPU in seconds; production values are the
    module constants. HSG_BENCH_NO_RELEASE=1 skips the TPU-takeover
    protocol (tests must never signal a live training continuation).
    """
    if not os.environ.get('HSG_BENCH_NO_RELEASE'):
        _release_tpu()
    import jax
    import jax.numpy as jnp

    from hsg_tpu.config import default_config
    from hsg_tpu.models import fcn as fcn_lib

    cfg = default_config()
    cfg.network.embedding_dim = 128
    cfg.network.kmeans_num_clusters = (6, 6)
    cfg.network.kmeans_iterations = 10
    cfg.network.max_segments_per_view = 64
    cfg.network.label_divisor = 2048
    cfg.network.compute_dtype = 'bfloat16'

    model = fcn_lib.resnet_50_fcn_test(cfg)

    batch = int(os.environ.get('HSG_BENCH_BATCH', 32))
    hw = int(os.environ.get('HSG_BENCH_HW', 448))
    iters = int(os.environ.get('HSG_BENCH_ITERS', ITERS))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, hw, hw, 3)), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), images[:1], None, None,
                           train=False)

    from hsg_tpu.utils.timing import time_chained

    def step(images, carry):
        out = model.apply(variables, images + carry * 1e-12, None, None,
                          train=False)
        return out['cluster_index'].sum().astype(jnp.float32)

    dt = time_chained(step, images, iters)
    img_s = batch / dt

    result = {
        'metric': '448x448 ResNet50-OS8 inference + spherical k-means',
        'value': round(img_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(img_s / REFERENCE_IMG_S, 2),
    }
    achieved = img_s * FLOPS_PER_IMG
    result['tflops'] = round(achieved / 1e12, 1)
    peak = _peak_for(jax.devices()[0])
    if peak:
        result['mfu'] = round(achieved / peak, 3)

    # Training-path metric (stage-1 at true shapes). Failure here must
    # not lose the primary inference metric — but it must also never be
    # silent: tests/test_bench_gate.py executes this whole flow and
    # fails on any *_error key (the round-4 regression class).
    del variables, images
    try:
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.rehearse_recipes import run as rehearse_run
    except Exception as e:  # never lose the inference metric
        rehearse_run = None
        result['train_error'] = f'{type(e).__name__}: {e}'[:200]
        result['train2_error'] = result['train_error']
    try:
        assert rehearse_run is not None, result.get('train_error')
        os.environ.setdefault('HSG_CHAINED', str(TRAIN_CHAIN))
        train_steps = int(
            os.environ.get('HSG_BENCH_TRAIN_STEPS', TRAIN_STEPS))
        rows = os.environ.get('HSG_BENCH_TRAIN_ROWS')
        tr = rehearse_run(
            'stage1', steps=train_steps, emit=False,
            rows=int(rows) if rows else None,
            hw=int(os.environ['HSG_BENCH_TRAIN_HW'])
            if os.environ.get('HSG_BENCH_TRAIN_HW') else None)
        result['train_ms_step'] = tr['ms_per_step']
        result['train_views_s'] = tr['views_per_s']
        if peak:
            result['train_mfu'] = round(
                tr['views_per_s'] * TRAIN_FLOPS_PER_VIEW / peak, 3)
    except Exception as e:
        result['train_error'] = f'{type(e).__name__}: {e}'[:200]

    # Stage-2 production-shape metric (96 view rows @448², all 5 losses,
    # selective res2,res3 remat — the round-5 A/B winner). UNCHAINED:
    # the scan-wrapped stage-2 compile is pathological through the TPU
    # tunnel (>45 min vs ~90 s bare, docs/DESIGN.md round-5 MFU
    # section); the ~4 ms/step dispatch inflation is noted with the
    # number. Same never-silent contract as the stage-1 metric.
    try:
        assert rehearse_run is not None, result.get('train2_error')
        os.environ.pop('HSG_CHAINED', None)
        os.environ.setdefault('HSG_REMAT', 'res2,res3')
        train2_steps = int(
            os.environ.get('HSG_BENCH_TRAIN2_STEPS', TRAIN2_STEPS))
        rows2 = os.environ.get('HSG_BENCH_TRAIN2_ROWS')
        tr2 = rehearse_run(
            'stage2_full', steps=train2_steps, emit=False,
            rows=int(rows2) if rows2 else None,
            hw=int(os.environ['HSG_BENCH_TRAIN_HW'])
            if os.environ.get('HSG_BENCH_TRAIN_HW') else None)
        result['train2_ms_step'] = tr2['ms_per_step']
        result['train2_views_s'] = tr2['views_per_s']
        result['train2_dispatch'] = 'unchained'
    except Exception as e:
        result['train2_error'] = f'{type(e).__name__}: {e}'[:200]

    return result


def main():
    print(json.dumps(run_bench()))


if __name__ == '__main__':
    main()

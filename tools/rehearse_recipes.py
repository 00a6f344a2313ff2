"""Rehearse the shipped recipes at TRUE shapes on the chip.

Runs the exact jitted train step of pyscripts/train.py at the reference
recipe scales (bashscripts/coco/train.sh:21-40):

  stage1   global batch 128 views @224², K=1x1 grid, 1 EM iteration,
           img_sim SegSort only (configs/coco_stage1.yaml)
  stage1p  stage1 with max_segments_per_view=128 -> 16,384 global
           prototype slots, which drives SegSortLoss's auto-routing
           (losses/segsort.py AUTO_CHUNK_THRESHOLD=8192) onto the fused
           Pallas NCA kernel INSIDE the compiled train step; the script
           asserts the kernel's tpu_custom_call is present in the HLO
  stage2   global batch 48 views @448², K=4x4 grid, 15 EM iterations,
           all 5 losses + both clustering transformers
           (configs/coco_stage2.yaml)

on synthetic on-device data (no host input pipeline — this isolates
step time; tools/measure_input_pipeline.py covers sustained end-to-end).
Reports steady-state ms/step, views/s, and HBM peak, and can capture a
profiler trace (--profile_dir).

Run on the chip:  PYTHONPATH=. python tools/rehearse_recipes.py \
    --stage stage1p --steps 500 [--profile_dir /tmp/trace]

Prints ONE JSON line per run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STAGES = {
    # name: (yaml, batch_rows, crop, max_segments_override)
    'stage1': ('configs/coco_stage1.yaml', 128, 224, None),
    'stage1p': ('configs/coco_stage1.yaml', 128, 224, 128),
    'stage2': ('configs/coco_stage2.yaml', 48, 448, None),
    # Production stage-2 shape: 48 images x 2 views = 96 view rows
    # (configs/coco_synthetic_stage2.yaml batch_size 48, remat true) —
    # the scale where the remat A/Bs matter.
    'stage2_full': ('configs/coco_stage2.yaml', 96, 448, None),
    # Cityscapes 1-stage recipe (bashscripts/cityscapes/train.sh:20-32):
    # hsg_cs variant, all 5 losses. The reference's global batch is
    # 8 GPUs x 4 images x 2 views = 64 view rows @448²
    # ('cityscapes_full'); 'cityscapes' keeps the round-2 32-row point
    # for comparability.
    'cityscapes': ('configs/cityscapes.yaml', 32, 448, None),
    'cityscapes_full': ('configs/cityscapes.yaml', 64, 448, None),
}


def synthetic_batch(rows, hw, num_views, seed=0):
    """Random images + grid instance labels standing in for superpixels
    (the reference's OWT-UCM PNGs enter training as instance labels)."""
    rng = np.random.default_rng(seed)
    image = rng.uniform(-2, 2, (rows, hw, hw, 3)).astype(np.float32)
    # HSG_PAD_CHANNELS=8: zero-pad the input to N channels (model.init
    # then builds a [7,7,N,64] stem kernel) — the conv-friendly channel
    # padding A/B (docs/ROADMAP.md perf backlog). Zeros keep the math
    # identical; only the stem conv's layout/tiling changes.
    pad_c = int(os.environ.get('HSG_PAD_CHANNELS', 0))
    if pad_c > 3:
        image = np.concatenate(
            [image, np.zeros((rows, hw, hw, pad_c - 3), np.float32)], -1)
    gy = (np.arange(hw) * 6 // hw)
    grid = (gy[:, None] * 6 + gy[None, :]).astype(np.int32)
    inst = np.broadcast_to(grid, (rows, hw, hw)).copy()
    return {
        'image': image,
        'semantic_label': np.zeros((rows, hw, hw), np.int32),
        'instance_label': inst,
        'image_index': (np.arange(rows) // num_views).astype(np.int32),
    }


def run(stage, steps, profile_dir=None, emit=True, rows=None, hw=None):
    """Time `steps` train steps of `stage` at its recipe shapes.

    rows/hw override the stage's true scale — used by the bench CI gate
    (tests/test_bench_gate.py) to execute this exact flow on CPU with
    tiny shapes; production callers leave them None.
    """
    import jax
    import jax.numpy as jnp
    from hsg_tpu.config import default_config, update_config
    from hsg_tpu.parallel import mesh as mesh_lib
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib
    from pyscripts.common import (build_embedding_model,
                                  build_prediction_model, head_multipliers)

    yaml_path, stage_rows, stage_hw, seg_override = STAGES[stage]
    rows = rows or stage_rows
    hw = hw or stage_hw
    config = update_config(default_config(), yaml_path)
    if seg_override:
        config.network.max_segments_per_view = seg_override
    if os.environ.get('HSG_NCA_DTYPE'):
        config.train.nca_compute_dtype = os.environ['HSG_NCA_DTYPE']
    if os.environ.get('HSG_NCA_IMPL'):
        config.train.nca_impl = os.environ['HSG_NCA_IMPL']
    # remat OFF by default: stage-2 at batch 48 @448² fits 16 GB HBM
    # without it, and the backward runs 20% faster (134.5 vs 167.5
    # ms/step measured). HSG_REMAT=1 re-enables for bigger batches;
    # HSG_REMAT='res2,res3' selects stage-selective remat (A/B).
    _remat_env = os.environ.get('HSG_REMAT', '')
    config.network.remat = (True if _remat_env == '1'
                            else _remat_env if _remat_env not in ('', '0')
                            else False)

    num_views = config.network.num_views
    protos = rows * config.network.max_segments_per_view

    embedding_model = build_embedding_model(config)
    prediction_model = build_prediction_model(config)

    batch = synthetic_batch(rows, hw, num_views)
    hw_mult, hb_mult = head_multipliers(config)
    state, update_fn = ts_lib.create_train_state(
        embedding_model, jax.random.PRNGKey(0), batch,
        head_weight_mult=hw_mult, head_bias_mult=hb_mult,
        momentum=config.train.momentum,
        weight_decay=config.train.weight_decay)
    schedule = opt_lib.schedule_from_config(config)
    base_step = ts_lib.make_train_step(embedding_model, prediction_model,
                                       schedule, update_fn)
    if os.environ.get('HSG_CHAINED'):
        # Chain CHAIN steps inside one jitted scan -> ONE dispatch for
        # the whole block. On tunneled runtimes the per-step host
        # dispatch RTT (~20-30 ms here) otherwise contaminates the
        # measurement; production dispatch is negligible either way.
        chain = int(os.environ.get('HSG_CHAINED'))

        def chained(state, batch, rng):
            def body(carry, i):
                st, r = carry
                r, sub = jax.random.split(r)
                st, metrics = base_step(st, batch, sub)
                return (st, r), metrics['loss']
            (state, _), losses = jax.lax.scan(
                body, (state, rng), jnp.arange(chain))
            return state, {'loss': losses[-1]}

        step_fn = jax.jit(chained, donate_argnums=(0,))
        steps = max(1, steps // chain)
    else:
        chain = 1
        step_fn = jax.jit(base_step, donate_argnums=(0,))

    mesh = mesh_lib.create_mesh()
    state = mesh_lib.replicate(state, mesh)
    sharded = mesh_lib.shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    lowered = step_fn.lower(state, sharded, rng)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    hlo = compiled.as_text()
    uses_pallas = 'tpu_custom_call' in hlo
    if protos > 8192 and jax.default_backend() == 'tpu':
        assert uses_pallas, (
            f'{stage}: {protos} prototypes (> 8192) but no tpu_custom_call '
            'in the compiled train step — Pallas NCA route not taken')

    # Steady state: run `steps` steps, timing after a 3-step warmup.
    for i in range(min(3, steps)):
        rng, sub = jax.random.split(rng)
        state, metrics = compiled(state, sharded, sub)
    jax.block_until_ready(metrics)
    n_timed = max(1, steps - 3)
    t0 = time.perf_counter()
    for i in range(n_timed):
        rng, sub = jax.random.split(rng)
        if profile_dir and i == 5:
            jax.profiler.start_trace(profile_dir)
        if profile_dir and i == 8:
            jax.profiler.stop_trace()
        state, metrics = compiled(state, sharded, sub)
    loss = float(metrics['loss'])          # final readback syncs the stream
    dt = (time.perf_counter() - t0) / n_timed / chain

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem['hbm_peak_gb'] = round(stats.get('peak_bytes_in_use', 0) / 2**30,
                                   2)
    except Exception:
        pass
    try:
        ma = compiled.memory_analysis()
        for field in ('argument_size_in_bytes', 'output_size_in_bytes',
                      'temp_size_in_bytes', 'alias_size_in_bytes',
                      'host_argument_size_in_bytes',
                      'host_output_size_in_bytes',
                      'host_temp_size_in_bytes',
                      'host_alias_size_in_bytes'):
            v = getattr(ma, field, None)
            if v:
                mem[field.replace('size_in_bytes', 'mb')] = round(v / 2**20)
    except Exception:
        pass

    out = {
        'stage': stage, 'rows': rows, 'hw': hw,
        'prototype_slots': protos,
        'ms_per_step': round(dt * 1e3, 1),
        'views_per_s': round(rows / dt, 1),
        'steps': n_timed * chain, 'chain': chain,
        'final_loss': round(loss, 4),
        'pallas_in_hlo': uses_pallas,
        'compile_s': round(compile_s, 1),
        **mem,
    }
    assert np.isfinite(loss), out
    if emit:
        print(json.dumps(out), flush=True)
    return out


def measure_flops(stage):
    """FLOPs/step of the stage's exact train step via XLA CPU cost
    analysis (the TPU executable's own cost_analysis under-reports
    convolutions ~10x — see docs/DESIGN.md baseline derivation). Run in
    a separate process: forces the CPU platform. MFU then =
    flops_per_step / step_time / 197e12 (v5e bf16 peak)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from hsg_tpu.config import default_config, update_config
    from hsg_tpu.train import optimizer as opt_lib
    from hsg_tpu.train import train_step as ts_lib
    from pyscripts.common import (build_embedding_model,
                                  build_prediction_model, head_multipliers)

    yaml_path, rows, hw, seg_override = STAGES[stage]
    config = update_config(default_config(), yaml_path)
    if seg_override:
        config.network.max_segments_per_view = seg_override
    config.network.remat = False

    embedding_model = build_embedding_model(config)
    prediction_model = build_prediction_model(config)
    batch = synthetic_batch(rows, hw, config.network.num_views)
    hw_mult, hb_mult = head_multipliers(config)
    state, update_fn = ts_lib.create_train_state(
        embedding_model, jax.random.PRNGKey(0), batch,
        head_weight_mult=hw_mult, head_bias_mult=hb_mult)
    schedule = opt_lib.schedule_from_config(config)
    step_fn = ts_lib.make_train_step(embedding_model, prediction_model,
                                     schedule, update_fn)
    compiled = jax.jit(step_fn).lower(
        state, batch, jax.random.PRNGKey(1)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca['flops'])
    out = {'stage': stage, 'rows': rows,
           'tflops_per_step': round(flops / 1e12, 3),
           'gflops_per_view': round(flops / rows / 1e9, 2)}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stage', choices=list(STAGES) + ['all'], default='all')
    ap.add_argument('--steps', type=int, default=500)
    ap.add_argument('--profile_dir', default=None)
    ap.add_argument('--flops', action='store_true',
                    help='count FLOPs/step on CPU instead of timing')
    args = ap.parse_args()
    stages = list(STAGES) if args.stage == 'all' else [args.stage]
    for s in stages:
        if args.flops:
            measure_flops(s)
        else:
            run(s, args.steps, args.profile_dir)


if __name__ == '__main__':
    main()

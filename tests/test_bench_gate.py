"""CI gate for bench.py — the file the driver runs at every round end.

Round 4 shipped with bench.py's training metric broken (a stale
`del compiled` swallowed into a `train_error` JSON field) because nothing
in the suite ever executed bench.py. This test runs the bench's REAL
main flow — the same run_bench() the driver's `python bench.py` hits —
on CPU with tiny-shape env overrides, and fails on:

  * any `*_error` key (an exception swallowed into the JSON), or
  * a missing headline/training metric key,

so no refactor of bench.py or tools/rehearse_recipes.py can silently
drop the train measurement again (VERDICT.md round-4, item 1).
"""

import importlib


def test_bench_main_flow_reports_all_metrics(monkeypatch):
    monkeypatch.setenv('HSG_BENCH_NO_RELEASE', '1')  # never signal a
    # live training continuation from the test suite
    monkeypatch.setenv('HSG_BENCH_BATCH', '2')
    monkeypatch.setenv('HSG_BENCH_HW', '64')
    monkeypatch.setenv('HSG_BENCH_ITERS', '2')
    # 8 rows: divisible by the conftest's 8-device CPU mesh AND num_views
    monkeypatch.setenv('HSG_BENCH_TRAIN_ROWS', '8')
    monkeypatch.setenv('HSG_BENCH_TRAIN_HW', '64')
    monkeypatch.setenv('HSG_BENCH_TRAIN_STEPS', '2')
    monkeypatch.setenv('HSG_CHAINED', '2')
    monkeypatch.setenv('HSG_BENCH_TRAIN2_ROWS', '8')
    monkeypatch.setenv('HSG_BENCH_TRAIN2_STEPS', '2')

    bench = importlib.import_module('bench')
    result = bench.run_bench()

    errors = {k: v for k, v in result.items() if k.endswith('_error')}
    assert not errors, f'bench swallowed an exception: {errors}'

    # Headline inference metric (driver contract).
    for key in ('metric', 'value', 'unit', 'vs_baseline', 'tflops'):
        assert key in result, f'bench result lost key {key!r}: {result}'
    assert result['value'] > 0

    # Training metric — the field round 4 lost.
    for key in ('train_ms_step', 'train_views_s'):
        assert key in result, f'bench result lost key {key!r}: {result}'
    assert result['train_ms_step'] > 0
    assert result['train_views_s'] > 0

    # Stage-2 production-shape metric (round 5).
    for key in ('train2_ms_step', 'train2_views_s'):
        assert key in result, f'bench result lost key {key!r}: {result}'
    assert result['train2_ms_step'] > 0
    # mfu/train_mfu only exist on real TPU device kinds; on the CPU test
    # platform their absence is expected.

"""Round-5 one-session measurement sweep (VERDICT r4 next-steps #4, #5, #6).

Runs, in ONE process on the real chip, the re-measurements the verdict asked
for so the committed numbers share a session and a chip state:

1. the exact bf16/int8 retrieval pair (#4: r03 recorded int8 130.2 < bf16
   187.7, inverting the double-rate-MXU story; r02 had int8 368 > bf16 235 —
   measure both once, side by side);
2. host vs device image preprocessing (#5: README cites the tool, not
   numbers);
3. the FLMR train step at per-chip batch 16 / 32 / 64 (#6: 70.6 achieved
   TFLOPS at B=16 is ~36% MFU — find where the examples/s and TFLOPS curves
   flatten and make the best point the bench default).

Each phase prints the same JSON lines bench.py would, then hard-frees all
device arrays (same rows-own-no-shared-state invariant as bench.py main).

Usage: python tools/round5_measurements.py [pair|preprocess|train]...
       (no args = all three; repo root, real TPU)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _free():
    import jax

    gc.collect()
    for a in jax.live_arrays():
        a.delete()
    gc.collect()


def phase_pair():
    t0 = time.perf_counter()
    bf16 = bench.bench_retrieval()
    print(f'{{"metric": "exact_retrieval_queries_per_sec_100k_corpus", '
          f'"value": {bf16:.1f}, "unit": "queries/s/chip (bf16 HBM index)"}}',
          flush=True)
    _free()
    i8 = bench.bench_retrieval_int8()
    print(f'{{"metric": "exact_retrieval_int8_queries_per_sec_100k_corpus", '
          f'"value": {i8:.1f}, "unit": "queries/s/chip (int8 HBM index)"}}',
          flush=True)
    _free()
    print(f"[pair] int8/bf16 = {i8 / bf16:.2f}x "
          f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)


def phase_preprocess():
    # measure_preprocess.main prints its own JSON lines
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import measure_preprocess

    measure_preprocess.main()
    _free()


def phase_train():
    for b in (16, 32, 64):
        os.environ["BENCH_TRAIN_B"] = str(b)
        t0 = time.perf_counter()
        try:
            ex_s = bench.bench_train_step()
            print(f'{{"metric": "flmr_train_examples_per_sec_B{b}", '
                  f'"value": {ex_s:.1f}, "unit": "query examples/s/chip '
                  f'(per-chip batch {b})"}}', flush=True)
        except Exception as e:  # OOM at large B is a data point, not a crash
            print(f"[train] B={b} failed after "
                  f"{time.perf_counter() - t0:.0f}s: {type(e).__name__}",
                  file=sys.stderr)
        _free()


def main(argv):
    bench._enable_compile_cache()
    phases = argv or ["pair", "preprocess", "train"]
    for p in phases:
        {"pair": phase_pair,
         "preprocess": phase_preprocess,
         "train": phase_train}[p]()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

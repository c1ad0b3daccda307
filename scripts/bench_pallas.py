"""DEPRECATED shim — see scripts/bench_extract_variants.py.

The round-2 version of this script timed scan-amortized ENQUEUE rates
(block_until_ready is a no-op on this backend; BENCH_NOTES "the enqueue
illusion") and concluded XLA/Pallas parity — struck in round 4 by the
fetch-forced re-measurement: the fused Pallas response+NMS kernel is
~40-1500x the XLA single-channel conv chain, and the defaults flipped.

This shim now just runs the honest benchmark so old invocations (CLAUDE.md
command table, muscle memory) land on real numbers.
"""

import runpy
import os

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_extract_variants.py"),
    run_name="__main__",
)

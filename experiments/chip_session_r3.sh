#!/bin/bash
# Round-3 chip session: runs the on-chip validation ladder in order, one
# process per probe (the backend wedges after a failed execution - see
# CLAUDE.md). Each stage logs to /tmp/r3_<stage>.log; a stage failure does
# not stop later stages (bench has its own staged fallback).
#
# Stages:
#   1. kernels  - QP kernel A/B at flagship size (small vs big_unroll),
#                 budgets 3x15 and 2x10 (experiments/probe_tpu_qpkernels.py)
#   2. flagship - full bench.py WITHOUT presets: flagship number first on a
#                 fresh chip, warm duals on (the new default)
#   3. coldref  - flagship bench with BENCH_WARM_DUALS=0 (the round-2 form)
#                 for the A/B delta the VERDICT asks for (>= 1.3x)
#   4. presets  - the five-preset table (BENCH_PRESETS=all), warm flagship
# Stage 2 vs 3 ordering note: both run the same fleet shapes; kernel
# compiles are cached server-side after the first run of each program.
set -u
cd /root/repo

run() {
  local tag=$1; shift
  echo "=== [$tag] $(date) ===" | tee -a /tmp/r3_session.log
  timeout "${STAGE_TIMEOUT:-5400}" "$@" > "/tmp/r3_${tag}.log" 2>&1
  echo "[$tag] rc=$? $(date)" | tee -a /tmp/r3_session.log
  tail -3 "/tmp/r3_${tag}.log" | tee -a /tmp/r3_session.log
}

run kernels  python experiments/probe_tpu_qpkernels.py
run flagship env BENCH_PRESETS= BENCH_NO_FALLBACK=1 python bench.py
run coldref  env BENCH_PRESETS= BENCH_NO_FALLBACK=1 BENCH_WARM_DUALS=0 python bench.py
run presets  env BENCH_NO_FALLBACK=1 python bench.py
# equilibration A/B on the presets the tuning table scaled (one per
# process: a failed execution can wedge the backend)
run scale_freq python experiments/probe_tpu_scale_ab.py not_state_freq
run scale_drag python experiments/probe_tpu_scale_ab.py drag_state
echo "=== session done $(date) ===" | tee -a /tmp/r3_session.log

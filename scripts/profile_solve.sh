#!/usr/bin/env bash
# Profiling capture — the `nsys profile --capture-range=cudaProfilerApi`
# analogue (demo/gpu_cg/submit.sh:15). Produces an xprof/tensorboard trace
# plus optimized-HLO dumps for roofline inspection.
#
# Usage: profile_solve.sh <logdir> [planar3d_app args...]
set -euo pipefail
LOGDIR=${1:?usage: profile_solve.sh <logdir> [args...]}; shift
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
XLA_FLAGS="${XLA_FLAGS:-} --xla_dump_to=$LOGDIR/hlo --xla_dump_hlo_as_text" \
python - "$LOGDIR" "$@" <<'EOF'
import sys
import jax
from wave_fenics_tpu.apps import planar3d_app

logdir = sys.argv[1]
sys.argv = ["planar3d_app"] + sys.argv[2:]
with jax.profiler.trace(logdir):
    planar3d_app.main()
print(f"trace written to {logdir} (view with tensorboard --logdir {logdir})")
EOF

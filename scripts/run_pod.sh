#!/usr/bin/env bash
# Multi-host TPU pod launcher — the Slurm submit-script analogue
# (demo/gpu_cg/submit-multinode.sh). On a TPU pod slice, run this on every
# host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all --command=...`);
# jax.distributed reads the pod metadata, so no rank plumbing is needed.
#
# Usage: run_pod.sh [--cells NX NY NZ] [--ndev N] ...  (args pass through)
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m wave_fenics_tpu.apps.planar3d_app "$@"

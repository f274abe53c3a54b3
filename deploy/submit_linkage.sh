#!/usr/bin/env bash
# Submit the flagship linkage pipeline as a Ray job.
#
#   deploy/submit_linkage.sh <pages_uri> <out_uri> [checkpoint_uri] [ray_job_address]
#
# On a cluster with the jobs API (ray[default] on the head node) this
# uses `ray job submit`; the job's driver is this repo's CLI, which
# attaches to the running cluster via RAY_ADDRESS (set by the job
# runtime) instead of starting a private session.
#
# In environments WITHOUT the jobs API (e.g. the test sandbox, where
# ray[default]'s dashboard deps are not installed), the same driver
# runs directly against a started cluster:
#   ray start --head --num-cpus=32
#   RAY_ADDRESS=auto python -m ehdc_llpg_address_matching_ray link \
#     --pages <pages> --from-html --out <out> --checkpoint <ck>
# — byte-for-byte the same entrypoint the job submission runs.
set -euo pipefail
PAGES="${1:?pages parquet uri}"
OUT="${2:?output uri}"
CK="${3:-}"
ADDR="${4:-http://127.0.0.1:8265}"

ARGS=(link --pages "$PAGES" --from-html --out "$OUT")
[[ -n "$CK" ]] && ARGS+=(--checkpoint "$CK")

exec ray job submit --address "$ADDR" --working-dir "$(dirname "$0")/.." -- \
  python -m ehdc_llpg_address_matching_ray "${ARGS[@]}"

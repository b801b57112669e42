#!/usr/bin/env bash
# TPU measurement campaign — outage-proof (VERDICT r3 #8).
#
# Runs the round's measurement sequence against the real TPU chip, with:
#   * repo-side logs + partial JSON under .campaign/ (survives /tmp wipes),
#   * retry-with-backoff while the axon tunnel is down,
#   * per-step done-markers so a killed-and-restarted campaign resumes,
#   * every artifact stamped with the git SHA of the tree that produced it.
#
# Usage:  bash scripts/campaign.sh [--once]
#   --once : probe once and exit nonzero if the tunnel is down (no wait loop).
#
# Steps (in order; each skipped when its .done marker exists):
#   1. phase256   : scripts/exp_grid_phase.py 256 — phase breakdown,
#                   binned-vs-dense parity, slot2/sweep-schedule comparison.
#   2. bench      : python bench.py → .campaign/bench_full.json
#   3. bench512   : covered inside bench.py (streamed_grid_512^3 extra).
set -u
cd "$(dirname "$0")/.."
mkdir -p .campaign
SHA=$(git rev-parse --short HEAD 2>/dev/null || echo unknown)
STATUS=.campaign/status.log
note() { echo "[$(date -u +%FT%TZ)] [$SHA] $*" | tee -a "$STATUS"; }

probe() {
  timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
x = jnp.ones((128, 128)); (x @ x).block_until_ready()
EOF
}

wait_for_tpu() {
  local delay=60
  while ! probe; do
    if [ "${1:-}" = "--once" ]; then
      note "tunnel DOWN (probe failed, --once)"; return 1
    fi
    note "tunnel DOWN; retrying in ${delay}s"
    sleep "$delay"
    delay=$((delay * 2)); [ "$delay" -gt 900 ] && delay=900
  done
  note "tunnel UP"
}

run_step() {
  # run_step <name> <cmd...>: logs to .campaign/<name>.log, marker on rc=0.
  local name=$1; shift
  local marker=.campaign/${name}.done
  if [ -f "$marker" ]; then note "step $name: already done ($(cat "$marker"))"; return 0; fi
  note "step $name: START: $*"
  ( echo "# sha=$SHA date=$(date -u +%FT%TZ) cmd=$*"; "$@" ) \
      >> ".campaign/${name}.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    echo "sha=$SHA date=$(date -u +%FT%TZ)" > "$marker"
    note "step $name: DONE"
  else
    note "step $name: FAILED rc=$rc (will retry next pass)"
  fi
  return $rc
}

note "campaign start"
pass=0
while :; do
  pass=$((pass + 1))
  wait_for_tpu "${1:-}" || exit 1
  ok=1
  run_step phase256 timeout 3600 python scripts/exp_grid_phase.py 256 || ok=0
  if [ ! -f .campaign/bench.done ]; then
    if ( echo "# sha=$SHA date=$(date -u +%FT%TZ)"; \
         timeout 5400 python bench.py ) > .campaign/bench_full.log 2>&1; then
      tail -n 1 .campaign/bench_full.log > .campaign/bench_full.json
      echo "sha=$SHA date=$(date -u +%FT%TZ)" > .campaign/bench.done
      note "step bench: DONE → .campaign/bench_full.json"
    else
      note "step bench: FAILED (see .campaign/bench_full.log)"; ok=0
    fi
  fi
  [ $ok -eq 1 ] && { note "campaign COMPLETE"; exit 0; }
  [ "${1:-}" = "--once" ] && exit 1
  note "pass $pass incomplete; sleeping 300s"
  sleep 300
done

#!/usr/bin/env bash
# Config-robustness matrix: the full graded sweep under adversarial
# session configs (r10 verdict ask #1).
#
# The pid-offset class proved a correctness bug can hide behind an
# optimizer premise (ReuseExchange) and pass every oracle at the blessed
# config. This sweep proves there is no remaining site: it dumps every
# graded query at sf0.01 under each graft.core.SessionConfigs preset,
# oracle-checks the default dump with DuckDB (tools/check.py), and
# canon-compares every adversarial dump against the default dump
# (tools/compare_dumps.py — same normalization, so identical-to-default
# == oracle-exact). Results land in SCALE_SOAK.md's "config matrix"
# section.
#
# NOTE: runs sbt several times sequentially — never concurrently with
# another sbt invocation (forked suites lazily load the classes dir).
#
# Usage: tools/config_matrix.sh [sfDir] [outRoot]
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
ROOT=${2:-/tmp/graft_confmatrix}
# r12: the allowlist is EMPTY — q_sketch now grades deterministic
# register/sample states and st_neardup grades its canonical-order
# face, so every dump must be bit-identical across configs. The
# --allow mechanism stays for future approximate faces.
ALLOW=""
mkdir -p "$ROOT"
for c in default no-reuse no-broadcast aqe-off shuffle7; do
  echo "== verify under preset: $c"
  # r11 advice: (a) clear the preset's dump dir first — a crashed
  # partial run must never leave stale dumps a later compare can pass
  # on; (b) propagate sbt's exit status — `| grep || true` swallowed a
  # failed Verify, letting the gate report clean on missing output.
  rm -rf "$ROOT/$c"
  LOG="$ROOT/verify_$c.log"
  if ! SPARK_GRAFT_CONF=$c sbt -batch "runMain graft.Verify $SF $ROOT/$c" \
      >"$LOG" 2>&1; then
    echo "!! Verify FAILED under preset $c — last 40 log lines:"
    tail -40 "$LOG"
    exit 1
  fi
  grep -E "\[verify\]" "$LOG" | tail -5 || true
done
echo "== oracle check (DuckDB) on the default dump"
python3 tools/check.py "$SF" "$ROOT/default"
for c in no-reuse no-broadcast aqe-off shuffle7; do
  echo "== canon-compare: $c vs default"
  python3 tools/compare_dumps.py "$ROOT/default" "$ROOT/$c" --allow "$ALLOW"
done
echo "== config matrix: all presets clean"

#!/usr/bin/env bash
# Full-suite verification in ~11 min wall instead of ~16 min serial
# (measured r15: shards finish 7:12 / 8:46 / 11:00 — the three
# local[8] sessions contend on a 32-cpu box, so the win is real but
# not 3x).  Each shard gets its own SparkSession; exit code is
# non-zero if any shard fails.  For the single-process fast lane use:
#   python -m pytest tests/ -m "not slow" -x -q        (~8 min)
set -u
cd "$(dirname "$0")/.."

python -m pytest tests/test_extensions.py tests/test_oracle_guard.py -q "$@" &
A=$!
python -m pytest tests/test_codec_properties.py tests/test_noise_distributions.py \
  tests/test_csprng.py tests/test_prdp.py tests/test_property_exact.py \
  tests/test_accountant_fuzz.py tests/test_sampler_soundness.py -q "$@" &
B=$!
python -m pytest tests/test_contracts.py tests/test_e2e_slice.py \
  tests/test_foundation.py tests/test_measurements2.py tests/test_plans.py \
  tests/test_reference_conformance.py tests/test_relational.py \
  tests/test_stability_parity.py tests/test_surface_smoke.py -q "$@" &
C=$!

rc=0
wait $A || rc=1
wait $B || rc=1
wait $C || rc=1
exit $rc

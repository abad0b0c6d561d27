#!/bin/bash
# Build the shimmed reference environment at /tmp/refbench (see
# benchmarks/reference_bench.py's module docstring for what the shims
# do and why every one of them only makes the reference faster).
set -euo pipefail
HERE="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
ROOT="${REFBENCH_ROOT:-/tmp/refbench}"
rm -rf "$ROOT"
mkdir -p "$ROOT/shims/typeguard" "$ROOT/shims/scipy"
cp -r /root/reference/src/tmlt "$ROOT/tmlt"
cp "$HERE/shim_files/typeguard_init.py" "$ROOT/shims/typeguard/__init__.py"
cp "$HERE/shim_files/scipy_init.py" "$ROOT/shims/scipy/__init__.py"
cp "$HERE/shim_files/scipy_stats.py" "$ROOT/shims/scipy/stats.py"
cp "$HERE/shim_files/rng_shim.py" "$ROOT/tmlt/core/random/rng.py"
cp "$HERE/shim_files/arb_shim.py" "$ROOT/tmlt/core/utils/arb.py"
echo "shimmed reference ready at $ROOT"

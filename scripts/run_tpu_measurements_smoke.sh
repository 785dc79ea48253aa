#!/usr/bin/env bash
# Kernel-default regression smoke (VERDICT r4 next #8): assert the measured
# routing defaults still beat their fallbacks. <2 min with a warm .jax_cache.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/smoke_kernel_defaults.py "$@"

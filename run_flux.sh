#!/usr/bin/env bash
# Launcher (parity: the reference's run_flux.sh — env checks, model-cache
# check, venv setup, server start). TPU edition: checks JAX + device access
# instead of macOS/arm64.

set -euo pipefail

PORT=7860
NETWORK=0

usage() {
    cat <<EOF
Usage: $0 [options]
  --port PORT     server port (default 7860)
  --network       listen on all interfaces
  --help          show this help
EOF
}

while [[ $# -gt 0 ]]; do
    case "$1" in
        --port) PORT="$2"; shift 2 ;;
        --network) NETWORK=1; shift ;;
        --help|-h) usage; exit 0 ;;
        *) echo "Unknown option: $1"; usage; exit 1 ;;
    esac
done

# ---- environment checks -----------------------------------------------
if ! command -v python3 >/dev/null; then
    echo "Error: python3 not found"; exit 1
fi

PYVER=$(python3 -c 'import sys; print(f"{sys.version_info.major}.{sys.version_info.minor}")')
echo "Python: ${PYVER}"

if ! python3 -c 'import jax' 2>/dev/null; then
    echo "Error: JAX is not installed. pip install 'jax[tpu]'"; exit 1
fi

python3 - <<'EOF'
import jax
devs = jax.devices()
print(f"JAX {jax.__version__} — {len(devs)} device(s): {devs[0].platform}")
EOF

# ---- model cache check ------------------------------------------------
CACHE="${HF_HOME:-$HOME/.cache/huggingface}/hub"
if [ -d "$CACHE" ]; then
    SIZE=$(du -sh "$CACHE" 2>/dev/null | cut -f1 || echo "?")
    echo "HF cache: $CACHE ($SIZE)"
    for m in FLUX.1-schnell FLUX.1-dev stable-diffusion-2-1-base sdxl-turbo musicgen-medium; do
        if ls "$CACHE" 2>/dev/null | grep -q "$m"; then
            echo "  [cached] $m"
        else
            echo "  [will download on first use] $m"
        fi
    done
else
    echo "No HF cache yet — models download on first use (~30 GB for all image models)."
fi

# ---- start server -----------------------------------------------------
ARGS=(--port "$PORT")
if [ "$NETWORK" = "1" ]; then
    ARGS+=(--listen-all)
    echo "Starting server on all interfaces, port $PORT"
else
    echo "Starting server on localhost:$PORT"
fi
exec python3 -m flux_generator_tpu.server.app "${ARGS[@]}"

"""Server entry point (parity: flux_app.py main(), flux_app.py:780-856).

python -m flux_generator_tpu.server.app [--port 7860] [--listen-all]
"""

from __future__ import annotations

import argparse
import socket

from .api import FluxAPI
from .httpd import Server


def check_port_available(host: str, port: int) -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        try:
            s.bind((host, port))
            return True
        except OSError:
            return False


def find_available_port(host: str, start_port: int, max_attempts: int = 10) -> int:
    for port in range(start_port, start_port + max_attempts):
        if check_port_available(host, port):
            return port
    raise RuntimeError(
        f"Could not find an available port in range "
        f"{start_port}-{start_port + max_attempts - 1}"
    )


def get_app(pipeline_factory=None, sd_factory=None):
    """Test factory (parity: flux_app.py:858-881): returns (api, server
    factory) without binding a port."""
    api = FluxAPI(pipeline_factory=pipeline_factory, sd_factory=sd_factory)
    return api


def _enable_compile_cache():
    """Persistent XLA compilation cache: model-switch and first-request
    compiles are paid once per machine. Shares bench.py's repo-local dir
    (FGT_COMPILE_CACHE overrides) so serving benefits from any previously
    compiled program and survives /tmp cleanup."""
    import os
    import pathlib

    import jax

    default = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache = os.environ.get("FGT_COMPILE_CACHE", str(default))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main(argv=None):
    _enable_compile_cache()
    # multi-host serving (TP-sharded pipelines over a pod slice): join the
    # slice before any device query; no-op on single-process setups
    from ..parallel.distributed import initialize_multihost, process_info

    initialize_multihost()
    pinfo = process_info()
    if pinfo["process_count"] > 1:
        print(f"multi-host serving: {pinfo}", flush=True)
    parser = argparse.ArgumentParser(description="Flux Generator TPU server")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument(
        "--listen-all", action="store_true",
        help="listen on all interfaces (0.0.0.0)",
    )
    parser.add_argument(
        "--warmup", metavar="MODEL",
        help="load MODEL and compile the default 512x512 path before serving",
    )
    parser.add_argument(
        "--w8a8", action="store_true",
        help="int8-activation MXU matmuls for quantized models (~1.4x faster "
             "flux denoise; quality study in tests/test_quant_quality.py). "
             "Must be set at startup — the flag bakes into compiled programs.",
    )
    args = parser.parse_args(argv)

    if args.w8a8:
        from ..ops.linear import set_w8a8

        set_w8a8(True)

    host = "0.0.0.0" if args.listen_all else "127.0.0.1"
    port = args.port
    if not check_port_available(host, port):
        port = find_available_port(host, port + 1)
        print(f"Port {args.port} busy; using {port}")

    api = FluxAPI()
    if args.warmup:
        print(f"Warming up {args.warmup} (load + compile 512x512)...", flush=True)
        api.generate_images("warmup", model=args.warmup, width=512, height=512)
        print("Warmup done.", flush=True)
    server = Server(api, host, port)
    shown = "localhost" if host == "127.0.0.1" else host
    print(f"Serving UI + A1111 API at http://{shown}:{port}/ (Ctrl-C to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()

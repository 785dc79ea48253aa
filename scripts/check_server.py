#!/usr/bin/env python3
"""Connectivity smoke test against a RUNNING server (parity:
test/test_connectivity.py — GET endpoints then a real small txt2img).

python scripts/check_server.py [--url http://localhost:7860] [--generate]
Exit code 0 on success.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request


def check(url: str, generate: bool) -> int:
    ok = True
    for ep in ("/sdapi/v1/sd-models", "/sdapi/v1/options", "/sdapi/v1/progress",
               "/health"):
        try:
            with urllib.request.urlopen(url + ep, timeout=10) as r:
                json.loads(r.read())
            print(f"[ok] GET {ep}")
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] GET {ep}: {e}")
            ok = False

    if generate and ok:
        try:
            req = urllib.request.Request(
                url + "/sdapi/v1/txt2img",
                json.dumps({"prompt": "test", "width": 128, "height": 128,
                            "steps": 1}).encode(),
                {"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                data = json.loads(r.read())
            assert data["images"][0].startswith("data:image/png")
            print("[ok] POST /sdapi/v1/txt2img")
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] txt2img: {e}")
            ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:7860")
    ap.add_argument("--generate", action="store_true",
                    help="also run a real 128px 1-step generation")
    args = ap.parse_args()
    sys.exit(check(args.url.rstrip("/"), args.generate))

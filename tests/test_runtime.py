import jax
import jax.numpy as jnp
import numpy as np

from flux_generator_tpu.runtime.dtypes import DtypePolicy, default_policy, f32_policy
from flux_generator_tpu.runtime.prng import RngStream
from flux_generator_tpu.runtime.profiling import PhaseTimer, device_memory_stats


def test_rng_stream_deterministic():
    a = RngStream(42)
    b = RngStream(42)
    np.testing.assert_array_equal(np.asarray(a.next()), np.asarray(b.next()))
    k1, k2 = a.take(2)
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))


def test_dtype_policy_cast():
    pol = default_policy()
    tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    out = pol.cast_params(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32  # ints untouched
    assert f32_policy().param_dtype == jnp.float32


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert "a" in t.phases
    assert "a:" in t.report()


def test_device_memory_stats_keys():
    stats = device_memory_stats()
    # axon fallback adds is_resident_lower_bound when memory_stats is absent
    assert {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"} <= set(stats)


def test_no_import_time_env_reads_in_ops():
    """Config hygiene (VERDICT r2 #9): every knob in ops/ must be read at
    CALL time through runtime.config (per-call overridable, live-server
    safe). An `os.environ` read at module scope freezes the knob at import
    and silently ignores later changes."""
    import ast
    from pathlib import Path

    ops = Path(__file__).parents[1] / "flux_generator_tpu" / "ops"
    offenders = []
    for py in ops.rglob("*.py"):
        tree = ast.parse(py.read_text())
        # walk module-level statements only (function bodies are fine)
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for child in ast.walk(node):
                    child._inside_fn = True  # noqa: SLF001
        for node in ast.walk(tree):
            if getattr(node, "_inside_fn", False):
                continue
            if (isinstance(node, ast.Attribute) and node.attr == "environ"
                    and isinstance(node.value, ast.Name)
                    and node.value.id == "os"):
                offenders.append(f"{py.name}:{node.lineno}")
    assert not offenders, f"import-time os.environ reads in ops/: {offenders}"

"""ExtractConfig precedence tests (defaults < from_env() < kwargs —
SURVEY.md §2.10, reference env semantics model.py:63-73)."""

from paddle_ray.core.config import ExtractConfig, _env_bool


def test_env_bool_reference_semantics(monkeypatch):
    for truthy in ("1", "true", "YES", " On "):
        monkeypatch.setenv("X_FLAG", truthy)
        assert _env_bool("X_FLAG", False) is True
    for falsy in ("0", "false", "off", "nope", ""):
        monkeypatch.setenv("X_FLAG", falsy)
        assert _env_bool("X_FLAG", True) is False
    monkeypatch.delenv("X_FLAG")
    assert _env_bool("X_FLAG", True) is True  # unset -> default


def test_from_env_precedence(monkeypatch):
    monkeypatch.setenv("IMAGE_CAPTIONING_ENABLED", "0")
    monkeypatch.setenv("MAX_NUM_INPUT_IMGS", "50")
    cfg = ExtractConfig.from_env()
    assert cfg.captioning_enabled is False and cfg.max_pages_per_doc == 50
    # explicit kwargs beat env
    cfg2 = ExtractConfig.from_env(captioning_enabled=True)
    assert cfg2.captioning_enabled is True and cfg2.max_pages_per_doc == 50


def test_hard_page_cap(monkeypatch):
    """env cannot exceed the hard cap 200 (= _HARD_MAX_NUM_INPUT_IMGS)."""
    monkeypatch.setenv("MAX_NUM_INPUT_IMGS", "100000")
    assert ExtractConfig.from_env().max_pages_per_doc == 200


def test_resolve_layout_pool_formula(ray_session):
    """Adaptive default: 3/4 of session CPUs, floor 6, cap 32; explicit
    cfg values pass through untouched."""
    import ray

    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.pipelines.extract import resolve_layout_pool

    n = int(ray.cluster_resources().get("CPU", 8))
    lo, hi = resolve_layout_pool(ExtractConfig())
    assert lo == 1
    assert hi == max(6, min(32, (n * 3) // 4))
    assert resolve_layout_pool(ExtractConfig(layout_pool_size=(4, 9))) == (4, 9)

import io
import time

from synerfgine_tpu.core.telemetry import Ema, Timer, MetricsLogger


def test_ema_converges():
    e = Ema(half_life=5)
    for _ in range(100):
        v = e.update(10.0)
    assert abs(v - 10.0) < 1e-6
    # first sample seeds directly
    e2 = Ema()
    assert e2.update(3.0) == 3.0


def test_timer_rolling_average():
    t = Timer(window=3)
    for _ in range(5):
        t.start("work")
        time.sleep(0.002)
        t.stop("work")
    assert len(t.records["work"]) == 3  # window caps
    assert t.mean_ms("work") >= 1.5
    out = []
    t.report(print_fn=out.append)
    assert any("AVE [work]" in line for line in out)


def test_timer_measure():
    t = Timer()
    assert t.measure("f", lambda a: a * 2, 21) == 42
    assert t.mean_ms("f") >= 0.0


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(path=p)
    m.log(1, loss=0.5, rays=4096)
    m.log(2, loss=0.4, rays=4096)
    m.close()
    import json

    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["step"] == 1 and lines[1]["loss"] == 0.4


def test_hash_level_stats():
    import jax
    from synerfgine_tpu.nn.hash_encoding import HashEncoding

    enc = HashEncoding(n_levels=4, n_features_per_level=2,
                       log2_hashmap_size=10, base_resolution=4)
    table = enc.init(jax.random.PRNGKey(0))
    stats = enc.level_stats(table)
    assert len(stats) == 4
    assert stats[0]["dense"] and stats[0]["resolution"] == 4
    assert all(s["sigma"] > 0 for s in stats)
    assert sum(s["size"] for s in stats) == enc.n_params

import json
import time

from upnerf.utils.profiling import StepTimer, summarize


def test_step_timer_uses_readout():
    calls = []
    t = StepTimer(readout=lambda: calls.append(1))
    with t.measure(n_steps=4):
        time.sleep(0.01)
    assert calls == [1]
    assert t.mean > 0 and t.p50 > 0


def test_summarize(tmp_path):
    p = tmp_path / "m.jsonl"
    with open(p, "w") as f:
        for i in range(4):
            f.write(json.dumps({"step": i, "time": 0.0, "loss": float(i), "note": "x"}) + "\n")
    s = summarize(str(p))
    assert s["loss"]["n"] == 4
    assert s["loss"]["mean"] == 1.5
    assert s["loss"]["last"] == 3.0
    assert "note" not in s and "step" not in s

"""bench.py's stdout line must ALWAYS be one parseable JSON line within
the driver's ~2 kB capture window, no matter how the registry grows or
how slow the host runs — a reporting-size problem must degrade
(full names → compact keys → roll-up → totals-only), never crash or
overflow (ADVICE r10: the bare assert turned overflow into a run
failure after all timing work had completed)."""

import json

from bench import MAX_LINE, stdout_line


def _full(cold):
    return {
        "value": round(sum(cold.values()), 2),
        "warm_total": round(sum(cold.values()), 2),
    }


def _check(cold, repeat=1):
    line = stdout_line(cold, _full(cold), sf=0.1, cpus=32, repeat=repeat)
    assert len(line) <= MAX_LINE
    out = json.loads(line)
    assert out["metric"] == "total_wall_sec"
    assert out["value"] == round(sum(cold.values()), 2)
    assert out["sf"] == 0.1 and out["cpus"] == 32
    return out


def test_small_registry_uses_full_names():
    cold = {f"query_{i}": 0.5 + i / 100 for i in range(20)}
    out = _check(cold)
    assert set(out["queries"]) == set(cold)


def test_current_registry_size_fits_itemized():
    # ~165 entries with realistic name lengths: must still itemize
    # every entry (full or compact keys), not roll up
    cold = {f"operator_entry_name_{i:03d}": 1.23 for i in range(165)}
    out = _check(cold, repeat=2)
    n_itemized = len([k for k in out["queries"] if k != "rest"])
    assert n_itemized >= 165 or out.get("qunit") == "centisec"


def test_huge_registry_rolls_up_but_parses():
    cold = {f"very_long_operator_entry_name_{i:04d}": 12.34 for i in range(400)}
    out = _check(cold)
    q = out["queries"]
    if "rest" in q:
        itemized = sum(v for k, v in q.items() if k not in ("rest", "rest_n"))
        assert round(itemized + q["rest"], 1) == round(sum(cold.values()), 1)


def test_pathological_overflow_falls_back_to_totals_only():
    # enough entries that compact keys overflow, with names so long the
    # roll-up's keep=1 form overflows too: the totals-only floor must
    # still print a parseable line
    cold = {"x" * 3000 + str(i): 1.0 for i in range(200)}
    out = _check(cold)
    assert out["queries"] == {}


def test_empty_registry_does_not_crash():
    out = stdout_line({}, {"value": 0.0}, sf=0.1, cpus=32)
    assert json.loads(out)["value"] == 0.0

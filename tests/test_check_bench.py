"""Unit tests for the bench regression gate (no Spark needed):
absolute floor tolerances plus the r10 canary-normalized check
(VERDICT r9 #2) — a uniform slow phase passes, a genuine single-query
regression flags even inside a fast phase."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "check_bench",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_bench.py"),
)
check_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_bench)


FLOOR = {
    "queries": {
        "q01_pricing_summary": 0.30,
        "alpha": 1.0,
        "beta": 0.8,
        "gamma": 2.0,
    }
}


def _cur(mult: float, **overrides) -> dict:
    qs = {q: round(f * mult, 3) for q, f in FLOOR["queries"].items()}
    qs.update(overrides)
    return {
        "metric": "headline_total_wall",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
    }


def test_fast_phase_all_at_floor_passes(capsys):
    assert check_bench.check_one(_cur(1.0), FLOOR) == 0


def test_uniform_slow_phase_passes(capsys):
    # 1.7x across the board: the absolute 1.8x/3.5x tolerances hold
    # and the canary normalizes every ratio-of-ratios to 1.0
    assert check_bench.check_one(_cur(1.7), FLOOR) == 0


def test_single_query_regression_in_fast_phase_flags(capsys):
    # canary at floor (fast phase) but alpha at 1.9x — under the 3.5x
    # absolute tolerance, so ONLY the canary check can catch it
    cur = _cur(1.0, alpha=1.9)
    assert check_bench.check_one(cur, FLOOR) == 1
    out = capsys.readouterr().out
    assert "canary-normalized" in out
    assert "alpha" in out


def test_regression_inside_slow_phase_flags(capsys):
    # phase 1.8x but gamma at 3.4x floor: passes the absolute check,
    # fails ratio-of-ratios (3.4/1.8 = 1.89 > 1.5)
    cur = _cur(1.8, gamma=round(2.0 * 3.4, 3))
    assert check_bench.check_one(cur, FLOOR) == 1
    out = capsys.readouterr().out
    assert "canary-normalized" in out and "gamma" in out


def test_tiny_absolute_excess_does_not_flag(capsys):
    # sub-second jitter guard: rr above 1.5 with < 0.25s absolute
    # excess stays quiet
    floor = {"queries": {"q01_pricing_summary": 0.30, "tiny": 0.10}}
    cur = {
        "metric": "headline_total_wall",
        "value": 0.47,
        "unit": "sec",
        "queries": {"q01_pricing_summary": 0.30, "tiny": 0.17},
        "sf": 0.1,
    }
    # tiny at 1.7x floor, phase 1.0 -> rr 1.7 > 1.5 BUT excess 0.07s < 0.25s
    assert check_bench.check_one(cur, floor) == 0


def test_lucky_fast_canary_clamps_to_one(capsys):
    # canary BELOW floor must not inflate ratios: alpha at 1.4x passes
    cur = _cur(1.0, q01_pricing_summary=0.21, alpha=1.4)
    assert check_bench.check_one(cur, FLOOR) == 0


def test_canary_itself_regressing_uses_absolute_check(capsys):
    # canary 4x floor: caught by the plain 3.5x per-query tolerance
    cur = _cur(1.0, q01_pricing_summary=1.2)
    assert check_bench.check_one(cur, FLOOR) == 1
    assert "3.5x floor" in capsys.readouterr().out


BASKET_FLOOR = {
    "queries": {
        "q01_pricing_summary": 0.30,
        "q02_filter_scan": 0.20,
        "q_agg_stats": 0.32,
        "alpha": 1.0,
    }
}


def _cur_basket(mult: float, **overrides) -> dict:
    qs = {q: round(f * mult, 3) for q, f in BASKET_FLOOR["queries"].items()}
    qs.update(overrides)
    return {
        "metric": "headline_total_wall",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
    }


def test_stale_single_canary_cannot_mask_regression(capsys):
    """The r11 failure mode: q01's floor is from a faster epoch so its
    ratio reads 1.9x even at fast phase. With the single canary that
    inflated the denominator and a true 1.9x regression hid; the
    basket's MEDIAN (two members at 1.0x) keeps phase honest."""
    cur = _cur_basket(1.0, q01_pricing_summary=0.57, alpha=1.9)
    assert check_bench.check_one(cur, BASKET_FLOOR) == 1
    out = capsys.readouterr().out
    assert "canary-normalized" in out and "alpha" in out
    assert "basket" in out


def test_basket_uniform_slow_phase_passes(capsys):
    # all three basket members + alpha at 1.7x: median phase 1.7,
    # everything normalizes to ~1.0
    assert check_bench.check_one(_cur_basket(1.7), BASKET_FLOOR) == 0


def test_one_noisy_basket_member_does_not_set_phase(capsys):
    # q_agg_stats alone at 2.5x (its own bad luck): median of
    # (1.0, 1.0, 2.5) = 1.0, so a genuine alpha regression still flags
    cur = _cur_basket(1.0, q_agg_stats=0.80, alpha=1.9)
    assert check_bench.check_one(cur, BASKET_FLOOR) == 1
    assert "alpha" in capsys.readouterr().out


def test_even_basket_uses_true_median_and_warns(capsys):
    """ADVICE r12: with a 2-member basket (one member missing from the
    run), the phase must be the MEAN of the two ratios — the old
    upper-middle pick would take the LARGER one, inflating phase and
    masking a real regression — and the degraded basket must warn."""
    floor = {
        "queries": {
            "q01_pricing_summary": 0.30,
            "q02_filter_scan": 0.20,
            # q_agg_stats has NO floor -> drops out of the basket
            "alpha": 1.0,
        }
    }
    # ratios: q01 1.0x, q02 2.0x -> true median 1.5; upper-middle would
    # read 2.0. alpha at 2.4x: rr = 2.4/1.5 = 1.6 > 1.5 flags under the
    # true median, but 2.4/2.0 = 1.2 would have slipped through.
    cur = {
        "metric": "headline_total_wall",
        "value": 3.1,
        "unit": "sec",
        "queries": {
            "q01_pricing_summary": 0.30,
            "q02_filter_scan": 0.40,
            "q_agg_stats": 0.32,
            "alpha": 2.4,
        },
        "sf": 0.1,
    }
    assert check_bench.check_one(cur, floor) == 1
    out = capsys.readouterr().out
    assert "alpha" in out and "canary-normalized" in out
    assert "WARNING" in out and "2 of 3" in out

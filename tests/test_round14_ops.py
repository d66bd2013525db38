"""Round-14 evidence tests.

t22's lossy (past-CAP) regime now has a MEASURED artifact
(measurements/t22_lossy_regime_r14.json, produced by
scripts/t22_lossy_probe.py running the registered query unchanged
with the CAP knob lowered on the real corpora). These tests pin the
recorded run to the SpaceSaving contract so a regenerated artifact
that violated the bound — or a probe edit that stopped checking it —
fails loudly (VERDICT r13 item 5: "a pytest asserting the bound on
the recorded run").
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "measurements", "t22_lossy_regime_r14.json")


class TestT22LossyRegimeArtifact:
    def _load(self):
        with open(ARTIFACT) as f:
            return json.load(f)

    def test_overshoot_bound_holds_in_every_recorded_run(self):
        art = self._load()
        assert art["runs"], "artifact must carry at least one run"
        for name, run in art["runs"].items():
            assert run["all_bounds_hold"], name
            assert run["max_overshoot"] <= run["bound_at_max_overshoot"], name

    def test_headline_lossy_run_has_zero_violations(self):
        art = self._load()
        head = art["headline_10x_cap16"]
        assert head["n_windows"] > 9000  # the 10x corpus, not a toy
        assert head["bound_violations"] == []
        # per-window max overshoot never exceeds the recorded worst,
        # which itself sits exactly at the floor(N_sw/cap) bound
        hist = {int(k): v for k, v in head["overshoot_histogram"].items()}
        run = art["runs"]["10x_cap16_lossy"]
        assert max(hist) == run["max_overshoot"]
        assert max(hist) <= run["bound_at_max_overshoot"]

    def test_lossy_flag_matches_cardinality_vs_cap(self):
        art = self._load()
        for name, run in art["runs"].items():
            expect = run["max_distinct_users_per_shard_window"] > run["cap"]
            assert run["lossy"] == expect, name

    def test_recall_ladder_recovers_with_cap(self):
        """More counters -> better rank recovery; the shipped exact
        regime (cap >= per-shard-window cardinality) must be perfect —
        that is the regime in which the driver oracle is valid."""
        art = self._load()
        r16 = art["runs"]["10x_cap16_lossy"]["mean_recall_at_k"]
        r64 = art["runs"]["10x_cap64_lossy"]["mean_recall_at_k"]
        r256 = art["runs"]["10x_cap256_shipped_exact"]
        assert r16 < r64 < 1.0
        assert r256["mean_recall_at_k"] == 1.0
        assert r256["min_recall_at_k"] == 1.0
        assert r256["max_overshoot"] == 0

"""Partition-agreement metrics + the non-parity quality floors.

Two layers (VERDICT r3 #3):
* the metric implementation (cluster/agreement.py) cross-checked against
  sklearn.metrics and hand-computable cases;
* floor tests over the quality scenarios (cluster/quality.py) pinning how
  far each precision-caveated mode (bf16/int8 residency, text fusion) may
  diverge from the f32 parity engine on OVERLAPPING mixtures — the regime
  where near-tied Ward distances actually flip. The f32-vs-f32 different-
  kmeans-seed yardstick must stay BELOW every mode's agreement: a dtype
  must never cost more divergence than the engine's own bucketing
  randomness.
"""

from __future__ import annotations

import numpy as np
import pytest

from imageclust_tpu.cluster.agreement import agreement, partition_vector
from imageclust_tpu.cluster.quality import (
    fusion_scoreboard,
    residency_scoreboard,
    synth_mixture,
    synth_mixture_labels,
)


class TestAgreementMetric:
    def test_identical_partitions_score_one(self):
        a = np.array([0, 0, 1, 1, 2, 2, 2])
        row = agreement(a, a)
        assert row["rand"] == row["ari"] == row["nmi"] == 1.0
        assert row["ami"] == 1.0
        assert row["pair_recall"] == row["pair_precision"] == 1.0
        assert row["same_pair_f1"] == 1.0

    def test_relabeling_is_invisible(self):
        a = np.array([0, 0, 1, 1, 2, 2])
        b = np.array([7, 7, 3, 3, 9, 9])  # same partition, new names
        assert agreement(a, b)["ari"] == 1.0

    def test_matches_sklearn_on_random_partitions(self):
        from sklearn.metrics import (
            adjusted_mutual_info_score,
            adjusted_rand_score,
            normalized_mutual_info_score,
        )

        rng = np.random.default_rng(0)
        for trial in range(5):
            n = 200
            a = rng.integers(0, 12, n)
            b = np.where(rng.random(n) < 0.6, a, rng.integers(0, 12, n))
            row = agreement(a, b)
            assert row["ari"] == pytest.approx(
                adjusted_rand_score(a, b), abs=5e-7)
            # ours is the sqrt normalization == sklearn's 'geometric'
            assert row["nmi"] == pytest.approx(
                normalized_mutual_info_score(
                    a, b, average_method="geometric"), abs=5e-7)
            assert row["ami"] == pytest.approx(
                adjusted_mutual_info_score(a, b), abs=1e-6)

    def test_dropped_items_excluded_from_pairs(self):
        a = np.array([0, 0, 1, 1, -1, 2])
        b = np.array([0, 0, 1, 1, 1, -1])
        row = agreement(a, b)
        assert row["excluded"] == 2
        assert row["n"] == 4
        assert row["ari"] == 1.0  # the jointly-assigned items agree exactly

    def test_pair_recall_precision_direction(self):
        # a merges {0,1,2,3} into one cluster; b splits it in two:
        # every b-pair is an a-pair (precision 1), half of a's pairs
        # survive in b (recall 2/6)
        a = np.zeros(4, np.int64)
        b = np.array([0, 0, 1, 1])
        row = agreement(a, b)
        assert row["pair_precision"] == 1.0
        assert row["pair_recall"] == pytest.approx(2 / 6)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape mismatch"):
            agreement(np.zeros(3, np.int64), np.zeros(4, np.int64))

    def test_too_few_joint_items_raises(self):
        with pytest.raises(ValueError, match="at least 2"):
            agreement(np.array([0, -1, -1]), np.array([-1, 0, 0]))

    def test_ami_skipped_above_cell_budget(self, monkeypatch):
        import imageclust_tpu.cluster.agreement as ag

        monkeypatch.setattr(ag, "_AMI_MAX_CELLS", 4)
        row = agreement(np.array([0, 0, 1, 1, 2, 2]),
                        np.array([0, 1, 1, 2, 2, 0]))
        assert row["ami"] is None
        assert -1.0 <= row["ari"] <= 1.0

    def test_partition_vector_roundtrip(self):
        ids = ["a", "b", "c", "d", "e"]
        cmap = {0: ["b", "a"], 1: ["d"]}
        vec = partition_vector(cmap, ids)
        assert list(vec) == [0, 0, -1, 1, -1]


class TestQualityFloors:
    """Floors measured on the forced-CPU conftest backend (exact arithmetic
    pinned by seeds; generous margins below the measured values so an XLA
    fusion change doesn't flake them)."""

    @pytest.fixture(scope="class")
    def residency(self):
        return residency_scoreboard(2000, 64, sep=1.0)

    def test_modes_beat_seed_yardstick(self, residency):
        yard = residency["f32_seed_yardstick"]["ari"]
        for mode in ("bfloat16", "int8"):
            assert residency[mode]["ari"] > yard, (
                f"{mode} diverges more than the engine's own kmeans seed: "
                f"{residency[mode]['ari']} <= {yard}")

    def test_residency_agreement_floors(self, residency):
        # measured on this backend: bf16 ~0.47, int8 ~0.47 at n=3000;
        # floors leave room for backend drift, not for regressions
        for mode in ("bfloat16", "int8"):
            assert residency[mode]["ari"] >= 0.30
            assert residency[mode]["same_pair_f1"] >= 0.30
            assert residency[mode]["nmi"] >= 0.80

    def test_residency_truth_quality_preserved(self, residency):
        """The real contract: a non-parity dtype may permute near-ties but
        must recover the TRUE structure as well as f32 does."""
        f32 = residency["f32"]["ari_vs_truth"]
        for mode in ("bfloat16", "int8"):
            assert residency[mode]["ari_vs_truth"] >= f32 - 0.05

    def test_fusion_text_floor(self):
        row = fusion_scoreboard(1500, 64, sep=1.0)
        assert row["ari"] >= 0.30
        assert abs(row["ari_vs_truth_text"]
                   - row["ari_vs_truth_onehot"]) <= 0.10

    def test_separated_blobs_agree_exactly(self):
        """Sanity anchor: far from ties every mode matches f32 outright
        (the regime the round-2 guard tests pinned). Balanced components of
        5 (inside [3,6]) so no component is ever split — unbalanced sizes
        would force tie-sensitive splits even at sep=50."""
        sb = residency_scoreboard(600, 32, sep=50.0, k=120, balanced=True)
        for mode in ("bfloat16", "int8"):
            assert sb[mode]["ari"] >= 0.99, sb[mode]


class TestMixtureGenerators:
    def test_synth_mixture_shapes_and_overlap(self):
        feats, truth = synth_mixture(500, 16, sep=1.0, seed=3)
        assert feats.shape == (500, 16)
        assert truth.shape == (500,)
        assert truth.max() >= 50  # k defaults to n//5 = 100 components

    def test_synth_mixture_labels_correlated(self):
        _, truth = synth_mixture(300, 8, sep=1.0)
        per_image, label_set = synth_mixture_labels(truth, seed=1)
        assert len(per_image) == 300
        assert all(labs for labs in per_image)
        # same component -> same primary label
        by_comp = {}
        for z, labs in zip(truth, per_image):
            by_comp.setdefault(int(z), set()).add(labs[0].name)
        assert all(len(v) == 1 for v in by_comp.values())
        # vocabulary is deliberately smaller than k (synonym collisions)
        assert len(label_set) < truth.max() + 1

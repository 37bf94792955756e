"""Signal-domain baseline gate (VERDICT r2 item 3): the committed
``SIGNAL_BASELINE.json`` artifact must match-or-beat the reference's only
quantitative baseline — ComplexDetectionModel at accuracy 0.9651 /
F1 0.9202 on 7,050 test signals
(`signals/improved_multisignal/test_results_Complex_20250717_1733/
Complex_metrics.txt:1-16`).

The artifact is produced by ``tools/bench_signal.py`` (reference recipe:
defect-focused windows, AdamW 6e-4/wd 0.015, plateau 0.7/2, BCE,
20 epochs, batch 4) on synthetic volumes with ~7.7k+ held-out signals at
a reference-like ~17-22%% positive rate. This test pins the evidence: if
a code change degrades the trained quality, the regenerated artifact
fails here.
"""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "SIGNAL_BASELINE.json")


@pytest.fixture(scope="module")
def baseline():
    if not os.path.exists(ARTIFACT):
        pytest.skip("SIGNAL_BASELINE.json not generated yet "
                    "(run tools/bench_signal.py)")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_scale_matches_reference(baseline):
    # comparable eval size and class balance to the 7,050-signal /
    # 22%-positive reference eval
    assert baseline["test_signals"] >= 7000
    ratio = baseline["test_positives"] / baseline["test_signals"]
    assert 0.10 <= ratio <= 0.35, ratio


@pytest.mark.parametrize("model", ["complex", "hybrid_binary"])
def test_beats_reference_baseline(baseline, model):
    ref = baseline["reference"]
    got = baseline[model]
    assert got["accuracy"] >= ref["accuracy"], (got, ref)
    assert got["f1"] >= ref["f1"], (got, ref)
    assert got["recall"] >= ref["recall"], (got, ref)
    assert got["precision"] >= ref["precision"], (got, ref)

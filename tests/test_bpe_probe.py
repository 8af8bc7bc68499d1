"""Pin the --crossover padding's validity (round 16, VERDICT r15
next-round #3): synth_merges_layered must produce WELL-FORMED merge
tables — every merge's operands exist before it, exactly the invariant
a Sennrich-trained table has — because an ill-formed pad would make
the large-table readings meaningless (merges that can never apply
price as free). Pure python, no Spark: the layered constructor is a
deterministic function of its base."""
from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bpe_probe",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bpe_probe.py"),
)
bpe_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bpe_probe)

ALPHABET = "abcdefghijklmnopqrstuvwxyz"
BASE = tuple((a, b) for a in ALPHABET for b in ALPHABET)  # 676 bigrams


def assert_well_formed(merges):
    """The trained-table invariant: each merge's left and right
    operands are single characters (initial symbols) or the product of
    an EARLIER merge."""
    produced = set(ALPHABET)
    for i, (left, right) in enumerate(merges):
        assert left in produced, (i, left)
        assert right in produced, (i, right)
        produced.add(left + right)


def test_layered_pad_is_well_formed_at_crossover_sizes():
    for n in (20, 676, 1000, 10_000, 50_000):
        table = bpe_probe.synth_merges_layered(BASE, n)
        assert len(table) == n
        assert_well_formed(table)


def test_layered_pad_is_deterministic_and_prefix_stable():
    """pad_model rule: the padded table is a deterministic function of
    (base, n), and a smaller pad is a PREFIX of a larger one — so the
    crossover's per-size tables differ only in their tail, never in
    the merges the corpus actually hits."""
    a = bpe_probe.synth_merges_layered(BASE, 10_000)
    b = bpe_probe.synth_merges_layered(BASE, 10_000)
    assert a == b
    big = bpe_probe.synth_merges_layered(BASE, 50_000)
    assert big[:10_000] == a
    assert big[:676] == BASE


def test_layered_pad_truncates_small_n():
    """n at or below the base length truncates the base (the review
    r12 regression guard: the first cut silently returned the full
    base)."""
    assert bpe_probe.synth_merges_layered(BASE, 20) == BASE[:20]
    assert bpe_probe.synth_merges_layered(BASE, 676) == BASE

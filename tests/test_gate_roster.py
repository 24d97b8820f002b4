"""Gate-roster integrity (ADVICE r8 + VERDICT r8 item 3).

The driver's correctness gate samples the FIRST 50 registry entries in
dict-insertion order, so the roster in plans/__init__.py IS the gate.
The import-time reorder deliberately skips unknown names (a rename must
not brick every import); THIS test is where a typo/rename fails loudly.
"""

from cdc_apache_cassandra_spark.plans import GATE_ROSTER, QUERIES


def test_roster_is_exactly_fifty():
    assert len(GATE_ROSTER) == 50
    assert len(set(GATE_ROSTER)) == 50, "duplicate roster entries"


def test_every_roster_name_is_registered():
    missing = [n for n in GATE_ROSTER if n not in QUERIES]
    assert not missing, f"gate roster names not in registry: {missing}"


def test_first_fifty_registry_entries_equal_roster():
    assert list(QUERIES)[:50] == GATE_ROSTER


def test_roster_samples_each_major_family():
    window = set(GATE_ROSTER)
    assert any(n.startswith("cdc_") for n in window)
    assert any(n.startswith("tpch_") for n in window)
    assert any(n.startswith("llm_") for n in window)
    assert any(n.startswith("multimodal_") for n in window)

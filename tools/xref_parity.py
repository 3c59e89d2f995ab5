#!/usr/bin/env python3
"""E17 parity: replay our xref expansions through the REFERENCE's own
CrossReferenceManager (kazu/steps/linking/post_processing/xref_manager.py),
executed, not reimplemented — the PARITY.md pattern extended to the
cross-reference plane.

The export (graft.XrefExport) carries the planted xref DB and our engine's
expansions for a set of input mappings (including negatives). This tool
builds a CrossReferenceManager subclass whose build_xref_cache returns the
SAME planted DB, registers the target parsers' metadata in the reference's
MetadataDatabase, runs create_xref_mappings over reference Mapping objects,
and compares field-by-field.

Usage:  python3 tools/xref_parity.py [/tmp/xref_export.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import kazu_shims  # noqa: F401,E402

from kazu.data import (  # noqa: E402
    DisambiguationConfidence, Mapping, StringMatchConfidence)
from kazu.database.in_memory_db import MetadataDatabase  # noqa: E402
from kazu.ontology_preprocessing.constants import DEFAULT_LABEL  # noqa: E402
from kazu.steps.linking.post_processing.xref_manager import (  # noqa: E402
    CrossReferenceManager)

export = json.load(open(sys.argv[1] if len(sys.argv) > 1 else
                        "/tmp/xref_export.json"))

# ---- reference manager over the SAME planted DB ---------------------------
xref_db = {}
lookup = {}
metadata = {}
for entry in export["xref_db"]:
    targets = []
    for t in entry["targets"]:
        targets.append((t["target_source"], t["target_idx"]))
        lookup[t["target_source"]] = t["parser_name"]
        metadata.setdefault(t["parser_name"], {})[t["target_idx"]] = {
            DEFAULT_LABEL: t["default_label"]}
    xref_db.setdefault(entry["source"], {})[entry["idx"]] = targets

mdb = MetadataDatabase()
for parser, meta in metadata.items():
    mdb.add_parser(parser, "xref_target_class", meta)


class PlantedXrefManager(CrossReferenceManager):
    def build_xref_cache(self, path):
        return xref_db


manager = PlantedXrefManager(source_to_parser_metadata_lookup=lookup,
                             path=None)


def ref_mapping(d):
    return Mapping(
        default_label=d["default_label"],
        source=d["source"],
        parser_name=d["parser_name"],
        idx=d["idx"],
        string_match_strategy="ExactMatchMapping",
        string_match_confidence=StringMatchConfidence[
            d["string_match_confidence"]],
        disambiguation_strategy=d["disambiguation_strategy"],
        disambiguation_confidence=(
            DisambiguationConfidence[d["disambiguation_confidence"]]
            if d["disambiguation_confidence"] else None),
    )


def key(parser, source, idx, label, smc, ds, dc):
    return (parser, source, idx, label, smc, ds, dc)


divergences = []
n_expanded = 0
for case in export["cases"]:
    inp = case["input"]
    ours = {
        key(m["parser_name"], m["source"], m["idx"], m["default_label"],
            m["string_match_confidence"], m["disambiguation_strategy"],
            m["disambiguation_confidence"])
        for m in case["expanded"]
    }
    theirs_raw = list(manager.create_xref_mappings(ref_mapping(inp)))
    theirs = {
        key(m.parser_name, m.source, m.idx, m.default_label,
            m.string_match_confidence.name, m.disambiguation_strategy,
            m.disambiguation_confidence.name
            if m.disambiguation_confidence else None)
        for m in theirs_raw
    }
    n_expanded += len(theirs)
    if ours != theirs:
        divergences.append((inp["source"], inp["idx"],
                            sorted(ours - theirs), sorted(theirs - ours)))
    # the strategy-name field is class-derived on both sides by design:
    # ours is the literal "XrefExpansion", the reference's is the manager
    # class name — assert the reference side really stamps its class
    for m in theirs_raw:
        assert m.string_match_strategy == "PlantedXrefManager", \
            m.string_match_strategy

print(f"cases: {len(export['cases'])}, reference expansions: {n_expanded}")
if divergences:
    for d in divergences:
        print("DIVERGENCE:", d)
    sys.exit(1)
print("XREF PARITY: 0 divergences (reference CrossReferenceManager executed)")

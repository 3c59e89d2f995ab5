#!/usr/bin/env python3
"""Generate a REFERENCE-shaped Label Studio export fixture by executing the
reference's own `KazuToLabelStudioConverter` (kazu/annotation/label_studio.py)
over the exact scenario of kazu/tests/test_label_studio.py — "the cat sat on
the mat" with a non-contiguous gene entity ("cat mat", two mappings), a
disease entity ("mat", one mapping) and an unmapped drug entity ("cat").

The reference test needs a live Label Studio server; the CONVERTER is pure
python, and a Label Studio export of an accepted task carries the same
`annotations[].result[]` regions the converter emits — so this fixture IS
the reference's export shape, produced by reference code. The script also
round-trips it through the reference's `LSToKazuConversion` to prove the
shape is what `export_from_ls` would parse.

Usage: python3 tools/make_ls_fixture.py [out.json]
Committed output: src/test/resources/ls_reference_export.json
(consumed unmodified by GoldReaderSpec via GoldReader.fromReferenceExport).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import kazu_shims  # noqa: F401,E402

from kazu.data import Document, Entity, Mapping, StringMatchConfidence  # noqa: E402
from kazu.annotation.label_studio import (  # noqa: E402
    KazuToLabelStudioConverter, LSToKazuConversion)

text = "the cat sat on the mat"
doc = Document.create_simple_document(text)
doc.idx = "lsfixturedoc0"
e1 = Entity.from_spans([(4, 7), (19, 22)], text=text, join_str=" ",
                       namespace="test", entity_class="gene")
e2 = Entity.from_spans([(19, 22)], text=text, join_str=" ",
                       namespace="test", entity_class="disease")
e3 = Entity.from_spans([(4, 7)], text=text, join_str=" ",
                       namespace="test", entity_class="drug")
e1.mappings.add(Mapping(default_label="cat mat", source="test1",
                        parser_name="test1", idx="1",
                        string_match_strategy="test",
                        disambiguation_strategy=None,
                        string_match_confidence=StringMatchConfidence.HIGHLY_LIKELY,
                        metadata={}))
e1.mappings.add(Mapping(default_label="cat mat", source="test2",
                        parser_name="test2", idx="2",
                        string_match_strategy="test",
                        disambiguation_strategy=None,
                        string_match_confidence=StringMatchConfidence.HIGHLY_LIKELY,
                        metadata={}))
e2.mappings.add(Mapping(default_label="mat", source="test3",
                        parser_name="test3", idx="3",
                        string_match_strategy="test",
                        disambiguation_strategy=None,
                        string_match_confidence=StringMatchConfidence.HIGHLY_LIKELY,
                        metadata={}))
doc.sections[0].entities.extend((e1, e2, e3))

tasks = list(KazuToLabelStudioConverter.convert_single_doc_to_tasks(doc, True))
assert len(tasks) == 1
# the Label Studio SERVER adds transport fields on export that the
# reference's export parser expects: the server task id and the
# "<docid>_<section>_<idx>" data id (see LSToKazuConversion.__init__ /
# _get_first_part_of_doc_id). Emulate exactly those two enrichments —
# every annotation region below them is the converter's verbatim output.
for i, t in enumerate(tasks):
    t["id"] = 1000 + i
    t["data"]["id"] = f"{doc.idx}_body_{i}"
    t["annotations"][0]["id"] = 2000 + i

# round-trip through the reference's export parser to prove the shape
docs_back = LSToKazuConversion.convert_tasks_to_docs(tasks)
assert len(docs_back) == 1
golds = docs_back[0].sections[0].metadata["gold_entities"]
summary = sorted(
    (g.entity_class, g.match,
     sorted(m.source for m in g.mappings), sorted(m.idx for m in g.mappings))
    for g in golds)
print("reference round-trip gold entities:")
for row in summary:
    print("  ", row)
assert ("gene", "cat mat", ["test1", "test2"], ["1", "2"]) in summary
assert ("disease", "mat", ["test3"], ["3"]) in summary
assert any(r[0] == "drug" and r[1] == "cat" for r in summary)

out = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/ls_reference_export.json"
with open(out, "w") as f:
    json.dump(tasks, f, indent=2, sort_keys=True)
print(f"wrote {out} ({len(tasks)} task)")

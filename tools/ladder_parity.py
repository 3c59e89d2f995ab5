#!/usr/bin/env python3
"""End-to-end ladder parity vs the EXECUTED reference (round-4 directive #4).

Replays this engine's mapping stage through the reference's own pure-python
StrategyRunner + mapping/disambiguation strategy classes (kazu @
/root/reference — the logic runs verbatim), over the candidate groups
exported by `graft.LadderExport`, and diffs the chosen mappings
entity-by-entity corpus-wide.

What is genuinely the reference's code here: StrategyRunner,
ConfidenceLevelStrategyExecution, ExactMatch/SymbolMatch/SynNormIsSubString/
StrongMatch mapping strategies, DefinedElsewhereInDocument / TfIdf /
PreferDefaultLabelMatch disambiguation strategies, MappingFactory, the
Entity/Document data model and its StringNormalizer-backed match_norm.

What is injected (model assets, not logic): the fitted per-parser tf-idf
context model (vocab + idf exported from the Scala build, so both engines
score with bit-identical weights) wrapped in a TfIdfScorer-interface object
whose __call__ replicates the reference scorer's scoring loop; and no-op
shims for wheels absent in this sandbox (bson, cattrs, sklearn, scipy,
torch, transformers, spacy, rapidfuzz, diskcache, cachetools, requests,
tqdm) — none of which participate in the replayed code paths.

Usage:  python3 tools/ladder_parity.py /tmp/ladder_export.json
"""
import json
import os
import sys
import types

# frozenset iteration order depends on string hashing — pin it for
# deterministic replays
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import kazu_shims  # noqa: F401,E402  (dependency shims + reference sys.path)


import numpy as np  # noqa: E402

from kazu.data import (  # noqa: E402
    CharSpan, DisambiguationConfidence, Document, Entity,
    EquivalentIdAggregationStrategy, EquivalentIdSet, LinkingCandidate,
    LinkingMetrics, MentionConfidence, Section, StringMatchConfidence)
from kazu.database.in_memory_db import MetadataDatabase, SynonymDatabase  # noqa: E402
from kazu.ontology_preprocessing.constants import DEFAULT_LABEL  # noqa: E402
from kazu.steps.linking.post_processing.strategy_runner import (  # noqa: E402
    ConfidenceLevelStrategyExecution, StrategyRunner)
from kazu.steps.linking.post_processing.mapping_strategies.strategies import (  # noqa: E402
    ExactMatchMappingStrategy, StrongMatchMappingStrategy,
    SymbolMatchMappingStrategy, SynNormIsSubStringMappingStrategy)
from kazu.steps.linking.post_processing.disambiguation.strategies import (  # noqa: E402
    AnnotationLevelDisambiguationStrategy,
    DefinedElsewhereInDocumentDisambiguationStrategy,
    GildaTfIdfDisambiguationStrategy,
    PreferDefaultLabelMatchDisambiguationStrategy,
    PreferNearestEmbeddingToDefaultLabelDisambiguationStrategy,
    TfIdfDisambiguationStrategy)


# --------------------------------------------------------------------------
# injected tf-idf model (exported Scala fit: identical vocab + idf weights)
# --------------------------------------------------------------------------
def context_features(s):
    """Bit-for-bit mirror of graft Featurizer.contextFeatures: word 1-2
    grams + prefixed char 2-3 grams over the lower-cased string."""
    lower = s.lower()
    words = lower.split(" ")
    feats = list(words)
    feats += [" ".join(words[i:i + 2]) for i in range(len(words) - 1)]
    feats += ["c2:" + lower[i:i + 2] for i in range(len(lower) - 1)]
    feats += ["c3:" + lower[i:i + 3] for i in range(len(lower) - 2)]
    return feats


class ExportedVectorizer:
    def __init__(self, vocab, idf):
        self.vocab = vocab
        self.idf = np.asarray(idf)

    def _vec(self, s):
        v = np.zeros(len(self.idf))
        for f in context_features(s):
            i = self.vocab.get(f)
            if i is not None:
                v[i] += 1.0
        v *= self.idf
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def transform(self, strings):
        return np.vstack([self._vec(s) for s in strings])


import re as _re


class ExportedSklearnWordsVectorizer:
    """sklearn TfidfVectorizer() default features (\b\w\w+\b, lowercase) over
    an exported (vocab, idf) fit — the Gilda model slot."""

    def __init__(self, vocab, idf):
        self.vocab = vocab
        self.idf = np.asarray(idf)

    def _vec(self, s):
        v = np.zeros(len(self.idf))
        for f in _re.findall(r"\b\w\w+\b", s.lower()):
            i = self.vocab.get(f)
            if i is not None:
                v[i] += 1.0
        v *= self.idf
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def transform(self, strings):
        return np.vstack([self._vec(s) for s in strings])


class ExportedGildaScorer:
    """GildaTfIdfScorer-interface wrapper over the exported model + context
    strings; __call__ mirrors the reference scorer's loop
    (context_scoring.py:201-232) including the null-vector rule for ids
    without a context."""

    def __init__(self, vectorizer, contexts):
        self.vectorizer = vectorizer
        self.id_vectors = {(c["parser"], c["idx"]):
                           vectorizer.transform([c["context"]])[0]
                           for c in contexts}
        self.null_vector = vectorizer.transform([""])[0]

    def __call__(self, context_vec, id_sets, parser_name):
        idx_to_vec = {}
        for equiv_id_set in id_sets:
            for idx in equiv_id_set.ids:
                idx_to_vec[idx] = self.id_vectors.get((parser_name, idx),
                                                      self.null_vector)
        if idx_to_vec:
            idx_lst = list(idx_to_vec.keys())
            mat = np.vstack(list(idx_to_vec.values()))
            # atleast_1d: a single-id probe squeezes to a 0-d array (the
            # reference never hits this — it documents len(id_sets) > 1 —
            # but the isolated-essential ladder probes unambiguous groups)
            scores = np.atleast_1d(-(np.asarray(context_vec) @ mat.T).squeeze())
            neighbours = scores.argsort()
            for neighbour in np.atleast_1d(neighbours):
                yield idx_lst[int(neighbour)], float(-scores[int(neighbour)])


class LookupStringScorer:
    """StringSimilarityScorer slot for PreferNearestEmbeddingToDefaultLabel:
    the exported MiniBern cosine for every (match, default label) pair the
    replay can hit — a model-asset injection; a missing pair fails loudly."""

    def __init__(self, rows):
        self.table = {(r["match"], r["label"]): r["score"] for r in rows}

    def __call__(self, reference_term, query_term):
        return self.table[(reference_term, query_term)]


class ExportedTfIdfScorer:
    """TfIdfScorer-interface wrapper; __call__ mirrors the reference
    scorer's loop (context_scoring.py:71-89) including the single-string
    100.0 bypass."""

    def __init__(self, parser_to_vectorizer):
        self.parser_to_vectorizer = parser_to_vectorizer

    def __call__(self, strings, matrix, parser):
        if len(strings) == 1:
            yield strings[0], 100.0
        else:
            mat = self.parser_to_vectorizer[parser].transform(strings)
            score_matrix = np.squeeze(-np.asarray(mat @ matrix.T))
            neighbours = score_matrix.argsort()
            for neighbour in neighbours:
                yield strings[neighbour], -score_matrix[neighbour]


# --------------------------------------------------------------------------
# load export, populate the reference's in-memory databases
# --------------------------------------------------------------------------
export = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ladder_export.json"))

mode = export.get("ladder", {}).get("mode", "default")

if mode == "classdisambig":
    # E16: run the REFERENCE's own EntityClassDisambiguationStep over the
    # exported post-NER documents (sentence spans included) and diff which
    # entities survive vs our step's decisions. The sklearn TfidfVectorizer
    # the step constructs internally resolves to the faithful numpy
    # reimplementation of its defaults in kazu_shims.
    from kazu.steps.linking.entity_class_disambiguation import (
        EntityClassDisambiguationStep)
    step = EntityClassDisambiguationStep(context={
        span: [{"entity_class": e["entity_class"],
                "relevant_text": list(e["relevant_text"]),
                "thresh": e["thresh"]}
               for e in entries]
        for span, entries in export["ecd_context"].items()})
    n_docs = n_secs = 0
    n_ents_pre = 0
    agree_secs = diverge = 0
    examples = []
    for dj in export["docs"]:
        n_docs += 1
        sections = []
        for sj in dj["sections"]:
            sec = Section(text=sj["text"], name=sj["name"])
            sec.sentence_spans = tuple(
                CharSpan(a, b) for a, b in sj["sentence_spans"])
            for ej in sj["entities"]:
                sec.entities.append(Entity(
                    match=ej["match"],
                    entity_class=ej["entity_class"],
                    spans=frozenset(CharSpan(a, b) for a, b in ej["spans"]),
                    namespace="test",
                    mention_confidence=MentionConfidence(ej["confidence"])))
            sections.append(sec)
        doc = Document(idx=dj["url"], sections=sections)
        step([doc])
        for sj, sec in zip(dj["sections"], doc.sections):
            n_secs += 1
            n_ents_pre += len(sj["entities"])
            ref_kept = sorted(
                (e.match, e.entity_class,
                 tuple(sorted((sp.start, sp.end) for sp in e.spans)))
                for e in sec.entities)
            ours_kept = sorted(
                (ej["match"], ej["entity_class"],
                 tuple(sorted((a, b) for a, b in ej["spans"])))
                for ej in sj["entities"] if ej["our_kept"])
            if ref_kept == ours_kept:
                agree_secs += 1
            else:
                diverge += 1
                if len(examples) < 5:
                    examples.append((dj["url"],
                                     [x for x in ours_kept if x not in ref_kept],
                                     [x for x in ref_kept if x not in ours_kept]))
    print("mode: classdisambig")
    print(f"docs: {n_docs}  sections: {n_secs}  entities pre-step: {n_ents_pre}")
    print(f"sections with IDENTICAL surviving-entity sets: {agree_secs}")
    print(f"diverging sections: {diverge}")
    for url, ours_only, ref_only in examples:
        print(f"  {url} ours-only={ours_only} ref-only={ref_only}")
    sys.exit(0 if diverge == 0 else 1)



candidates = {}
for c in export["ontology"]["candidates"]:
    id_sets = frozenset(
        EquivalentIdSet(frozenset((idx, src) for idx, src in s))
        for s in c["id_sets"])
    cand = LinkingCandidate(
        raw_synonyms=frozenset(c["raw_synonyms"]),
        synonym_norm=c["syn_norm"],
        parser_name=c["parser"],
        is_symbolic=c["is_symbolic"],
        associated_id_sets=id_sets,
        aggregated_by=EquivalentIdAggregationStrategy[c["aggregated_by"]],
        mapping_types=frozenset(c["mapping_types"]))
    candidates[(c["parser"], c["syn_norm"])] = cand

meta_by_parser = {}
for mrow in export["ontology"]["metadata"]:
    meta_by_parser.setdefault(mrow["parser"], {})[mrow["idx"]] = dict(
        {DEFAULT_LABEL: mrow["default_label"]}, **mrow.get("extras", {}))

mdb = MetadataDatabase()
sdb = SynonymDatabase()
for parser, ecls in export["ontology"]["entity_class_of"].items():
    mdb.add_parser(parser, ecls, meta_by_parser.get(parser, {}))
    sdb.add_parser(parser, [c for (p, _), c in candidates.items() if p == parser])

scorer = ExportedTfIdfScorer({
    parser: ExportedVectorizer(v["vocab"], v["idf"])
    for parser, v in export["vectorizers"].items()})


# --------------------------------------------------------------------------
# the ladder, mirrored from graft.link.Ladders.default for the default
# entity classes (this corpus's classes — operator, component — use the
# default strategy lists at every level), built from REFERENCE classes
# --------------------------------------------------------------------------
HL, P, POSS = (StringMatchConfidence.HIGHLY_LIKELY,
               StringMatchConfidence.PROBABLE, StringMatchConfidence.POSSIBLE)
DHL, DP, DPOSS = (DisambiguationConfidence.HIGHLY_LIKELY,
                  DisambiguationConfidence.PROBABLE,
                  DisambiguationConfidence.POSSIBLE)
RELEVANT = [EquivalentIdAggregationStrategy.UNAMBIGUOUS,
            EquivalentIdAggregationStrategy.RESOLVED_BY_SIMILARITY,
            EquivalentIdAggregationStrategy.MERGED_AS_NON_SYMBOLIC]


def disamb_default():
    return [DefinedElsewhereInDocumentDisambiguationStrategy(DHL),
            TfIdfDisambiguationStrategy(DP, scorer=scorer,
                                        relevant_aggregation_strategies=RELEVANT)]


def disamb_prefer_default_label():
    return [PreferDefaultLabelMatchDisambiguationStrategy(DHL)]


symbolic_hl = ConfidenceLevelStrategyExecution(
    ent_class_strategies={},
    default_strategies=[
        ExactMatchMappingStrategy(HL, disamb_default()),
        SymbolMatchMappingStrategy(P, disamb_default()),
        SynNormIsSubStringMappingStrategy(P, disamb_default()),
        StrongMatchMappingStrategy(POSS, disamb_default(), symbolic_only=True)],
    stop_on_success=True)
symbolic_probable = ConfidenceLevelStrategyExecution(
    ent_class_strategies={},
    default_strategies=[ExactMatchMappingStrategy(HL, disamb_default())],
    stop_on_success=True)
possible = ConfidenceLevelStrategyExecution(
    ent_class_strategies={},
    default_strategies=[
        ExactMatchMappingStrategy(
            HL, [DefinedElsewhereInDocumentDisambiguationStrategy(DHL)],
            disambiguation_essential=True)],
    stop_on_success=True)
non_symbolic_hl = ConfidenceLevelStrategyExecution(
    ent_class_strategies={},
    default_strategies=[
        ExactMatchMappingStrategy(HL, disamb_prefer_default_label(),
                                  disambiguation_essential=True),
        ExactMatchMappingStrategy(HL, disamb_default()),
        StrongMatchMappingStrategy(POSS, disamb_default())],
    stop_on_success=True)
non_symbolic_probable = ConfidenceLevelStrategyExecution(
    ent_class_strategies={},
    default_strategies=[
        ExactMatchMappingStrategy(HL, disamb_prefer_default_label(),
                                  disambiguation_essential=True),
        ExactMatchMappingStrategy(HL, disamb_default())],
    stop_on_success=True)

if mode == "default":
    runner = StrategyRunner(
        symbolic_strategies={"HIGHLY_LIKELY": symbolic_hl,
                             "PROBABLE": symbolic_probable,
                             "POSSIBLE": possible},
        non_symbolic_strategies={"HIGHLY_LIKELY": non_symbolic_hl,
                                 "PROBABLE": non_symbolic_probable,
                                 "POSSIBLE": possible})
else:
    # the isolated ladder of the E10/E11/E13 driver oracles: one ExactMatch
    # rung carrying ONLY the strategy under test (essential), at every
    # confidence level of both folds — strategy instances from the
    # REFERENCE's own classes, model slots injected from the export
    def make_strategy():
        if mode == "gilda":
            g = export["gilda"]
            scorer = ExportedGildaScorer(
                ExportedSklearnWordsVectorizer(g["vectorizer"]["vocab"],
                                               g["vectorizer"]["idf"]),
                g["contexts"])
            return GildaTfIdfDisambiguationStrategy(DP, scorer=scorer)
        if mode == "annotation":
            return AnnotationLevelDisambiguationStrategy(DPOSS)
        if mode == "embed":
            return PreferNearestEmbeddingToDefaultLabelDisambiguationStrategy(
                complex_string_scorer=LookupStringScorer(export["embed_scores"]),
                confidence=DPOSS)
        raise ValueError(mode)

    def isolated_exec():
        return ConfidenceLevelStrategyExecution(
            ent_class_strategies={},
            default_strategies=[ExactMatchMappingStrategy(
                HL, [make_strategy()], disambiguation_essential=True)],
            stop_on_success=True)

    runner = StrategyRunner(
        symbolic_strategies={lvl: isolated_exec()
                             for lvl in ("HIGHLY_LIKELY", "PROBABLE", "POSSIBLE")},
        non_symbolic_strategies={lvl: isolated_exec()
                                 for lvl in ("HIGHLY_LIKELY", "PROBABLE", "POSSIBLE")})


# --------------------------------------------------------------------------
# replay + diff
# --------------------------------------------------------------------------
def mapping_key(parser, source, idx, strategy, smc, dstrat, dconf):
    return (parser, source, idx, strategy, smc, dstrat or "", dconf or "")


n_docs = n_entities = n_entities_with_candidates = 0
n_norm_mismatch = 0
agree = diverge = 0
n_ref_mappings_total = n_entities_ref_mapped = 0
divergence_buckets = {}

for dj in export["docs"]:
    n_docs += 1
    sections = []
    exported_entities = []  # aligned with python entities
    for sj in dj["sections"]:
        sec = Section(text=sj["text"], name=sj["name"])
        for ej in sj["entities"]:
            ent = Entity(
                match=ej["match"],
                entity_class=ej["entity_class"],
                spans=frozenset(CharSpan(s, e) for s, e in ej["spans"]),
                namespace=ej["namespace"],
                mention_confidence=MentionConfidence(ej["confidence"]))
            if ent.match_norm != ej["match_norm"]:
                n_norm_mismatch += 1
            for cj in ej["candidates"]:
                cand = candidates[(cj["parser"], cj["syn_norm"])]
                ent.add_or_update_linking_candidate(cand, LinkingMetrics(
                    exact_match=cj.get("exact_match"),
                    search_score=cj.get("search_score")))
            sec.entities.append(ent)
            exported_entities.append((ent, ej))
        sections.append(sec)
    doc = Document(idx=dj["url"], sections=sections)
    runner(doc)
    for ent, ej in exported_entities:
        n_entities += 1
        if ej["candidates"]:
            n_entities_with_candidates += 1
        ref_mappings = set(
            mapping_key(m.parser_name, m.source, m.idx, m.string_match_strategy,
                        m.string_match_confidence.name,
                        m.disambiguation_strategy,
                        m.disambiguation_confidence.name
                        if m.disambiguation_confidence else None)
            for m in ent.mappings)
        ours = set(
            mapping_key(m["parser"], m["source"], m["idx"], m["strategy"],
                        m["string_match_confidence"],
                        m.get("disambiguation_strategy"),
                        m.get("disambiguation_confidence"))
            for m in ej["our_mappings"])
        n_ref_mappings_total += len(ref_mappings)
        if ref_mappings:
            n_entities_ref_mapped += 1
        if ref_mappings == ours:
            agree += 1
        else:
            diverge += 1
            bucket = (ej["match"], ej["entity_class"],
                      tuple(sorted(ours - ref_mappings)),
                      tuple(sorted(ref_mappings - ours)))
            divergence_buckets.setdefault(bucket, []).append(
                (dj["url"], ej["spans"]))

print(f"mode: {mode}")
print(f"docs: {n_docs}")
print(f"entities: {n_entities} ({n_entities_with_candidates} with candidates)")
print(f"match_norm mismatches (ours vs reference StringNormalizer): {n_norm_mismatch}")
print(f"entities the reference runner mapped: {n_entities_ref_mapped} "
      f"({n_ref_mappings_total} mappings)")
print(f"entities with IDENTICAL mapping sets: {agree}")
print(f"entities with diverging mapping sets: {diverge}")
if divergence_buckets:
    print("\ndivergence buckets (match, class, ours-only, reference-only, n, example):")
    for (match, cls, ours_only, ref_only), occ in sorted(
            divergence_buckets.items(), key=lambda kv: -len(kv[1])):
        print(f"  match={match!r} class={cls} n={len(occ)} example={occ[0]}")
        for m in ours_only:
            print(f"    ours-only: {m}")
        for m in ref_only:
            print(f"    ref-only:  {m}")
sys.exit(0 if diverge == 0 and n_norm_mismatch == 0 else 1)

"""No-op import shims for wheels absent in the zero-egress sandbox, so the
reference's pure-python modules (kazu @ /root/reference) import cleanly.
None of the shimmed libraries participate in any replayed code path —
see tools/ladder_parity.py for the inventory of what runs verbatim.

Import this module BEFORE anything from `kazu`.
"""
import sys
import types

# --------------------------------------------------------------------------
# dependency shims (absent wheels; never on the replayed code path)
# --------------------------------------------------------------------------
class _Stub:
    """Permissive stand-in type: subclassable, subscriptable, callable."""
    def __init__(self, *a, **k): pass
    def __class_getitem__(cls, item): return cls


def shim(name, **attrs):
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package so sub-module shims resolve
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _ObjectId:
    def __init__(self, *a, **k):
        import uuid
        self._v = uuid.uuid4().hex


_bson = shim("bson", ObjectId=_ObjectId)
_bson.json_util = shim("bson.json_util",
                       default=lambda v: str(v), object_hook=lambda v: v)


class _Conv:
    def register_unstructure_hook(self, *a, **k): pass
    def register_structure_hook(self, *a, **k): pass


_cattrs = shim("cattrs")
_cattrs.preconf = shim("cattrs.preconf")
_cattrs.preconf.json = shim("cattrs.preconf.json",
                            make_converter=lambda **k: _Conv(), JsonConverter=object)
sys.modules["cattrs.preconf.json"] = _cattrs.preconf.json
_cattrs.strategies = shim("cattrs.strategies",
                          include_subclasses=lambda *a, **k: None)
_cattrs.gen = shim("cattrs.gen",
                   make_dict_unstructure_fn=lambda *a, **k: (lambda *x: None),
                   make_dict_structure_fn=lambda *a, **k: (lambda *x: None),
                   override=lambda **k: None)


class _LFUCache(dict):
    def __init__(self, maxsize=128, *a, **k):
        super().__init__()


shim("cachetools", LFUCache=_LFUCache)


class _DiskCache:
    def __init__(self, *a, **k): pass

    def memoize(self, *a, **k):
        return lambda fn: fn


shim("diskcache", Cache=_DiskCache)
shim("requests", Session=_Stub, Response=_Stub, HTTPError=type("HTTPError", (Exception,), {}),
     get=lambda *a, **k: None, post=lambda *a, **k: None)
shim("requests.adapters", HTTPAdapter=_Stub, Retry=_Stub)
_scipy = shim("scipy")
_scipy.sparse = shim("scipy.sparse", csr_matrix=_Stub, vstack=lambda *a, **k: None)
_skl = shim("sklearn")
_skl.feature_extraction = shim("sklearn.feature_extraction")
import re as _re
try:
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None


class _CsrLike:
    """Minimal CSR-matrix stand-in over a dense ndarray: exactly the surface
    the replayed reference code touches (.data nonzeros row-major, .dot,
    np.asarray interop)."""

    def __init__(self, dense):
        self.dense = _np.asarray(dense)

    @property
    def data(self):
        out = []
        for row in _np.atleast_2d(self.dense):
            nz = _np.nonzero(row)[0]
            out.extend(row[nz])
        return _np.asarray(out)

    def dot(self, other):
        return self.dense @ other

    def toarray(self):
        return self.dense

    def __array__(self, dtype=None):
        return self.dense if dtype is None else self.dense.astype(dtype)


class FaithfulTfidfVectorizer:
    """A numpy reimplementation of sklearn TfidfVectorizer's DEFAULTS
    (lowercase word tokens \b\w\w+\b, smooth idf ln((1+n)/(1+df))+1,
    l2-normalized rows, alphabetically sorted vocabulary) — the model slot
    behind reference code that constructs `TfidfVectorizer()` itself
    (EntityClassDisambiguationStep). The same formulas are pinned against
    a numpy replica of sklearn in the repo's tfidf_scores.tsv fixture."""

    def __init__(self, lowercase=True, analyzer=None):
        self.lowercase = lowercase
        self.analyzer = analyzer

    def _feats(self, s):
        if callable(self.analyzer):
            return list(self.analyzer(s))
        return _re.findall(r"\b\w\w+\b", s.lower() if self.lowercase else s)

    def fit(self, docs):
        docs = list(docs)
        df = {}
        for d in docs:
            for f in set(self._feats(d)):
                df[f] = df.get(f, 0) + 1
        self.vocabulary_ = {f: i for i, f in enumerate(sorted(df))}
        n = len(docs)
        self.idf_ = _np.zeros(len(df))
        for f, c in df.items():
            self.idf_[self.vocabulary_[f]] = _np.log((1.0 + n) / (1.0 + c)) + 1.0
        return self

    def transform(self, docs):
        rows = []
        for d in docs:
            v = _np.zeros(len(self.idf_))
            for f in self._feats(d):
                i = self.vocabulary_.get(f)
                if i is not None:
                    v[i] += 1.0
            v *= self.idf_
            nrm = _np.linalg.norm(v)
            rows.append(v / nrm if nrm > 0 else v)
        return _CsrLike(_np.vstack(rows) if rows
                        else _np.zeros((0, len(self.idf_))))

    def fit_transform(self, docs):
        docs = list(docs)
        self.fit(docs)
        return self.transform(docs)


shim("sklearn.feature_extraction.text", TfidfVectorizer=FaithfulTfidfVectorizer)
_skl.utils = shim("sklearn.utils")
shim("sklearn.utils.extmath", safe_sparse_dot=lambda a, b: a @ b)
shim("rapidfuzz", fuzz=types.SimpleNamespace(ratio=lambda *a, **k: 0.0))
_torch = shim("torch", Tensor=_Stub, cosine_similarity=lambda *a, **k: 0.0,
              softmax=lambda *a, **k: None, no_grad=_Stub, device=_Stub,
              cat=lambda *a, **k: None, stack=lambda *a, **k: None)
_torch.nn = shim("torch.nn", Module=_Stub)
_torch.utils = shim("torch.utils")
_torch.utils.data = shim("torch.utils.data", DataLoader=_Stub, Dataset=_Stub,
                         IterableDataset=_Stub)
shim("transformers", BatchEncoding=_Stub, PreTrainedTokenizerBase=_Stub,
     AutoConfig=_Stub, AutoTokenizer=_Stub, AutoModel=_Stub,
     AutoModelForTokenClassification=_Stub, DataCollatorWithPadding=_Stub,
     PreTrainedModel=_Stub)
shim("transformers.modeling_outputs", TokenClassifierOutput=_Stub,
     BaseModelOutput=_Stub)
shim("transformers.utils", check_min_version=lambda *a, **k: None)
shim("transformers.file_utils", PaddingStrategy=_Stub)
shim("transformers.tokenization_utils_base", TruncationStrategy=_Stub)
_spacy = shim("spacy")
_spacy_registry_placeholder = types.SimpleNamespace(
    languages=lambda name: (lambda cls: cls),
    misc=lambda name: (lambda fn: fn),
    tokenizers=lambda name: (lambda fn: fn))
_spacy.registry = types.SimpleNamespace(
    languages=lambda name: (lambda cls: cls),
    misc=lambda name: (lambda fn: fn),
    tokenizers=lambda name: (lambda fn: fn))
_spacy.blank = lambda *a, **k: _Stub()
_spacy.load = lambda *a, **k: _Stub()
_spacy.matcher = shim("spacy.matcher", Matcher=_Stub, PhraseMatcher=_Stub)
_spacy.util = shim("spacy.util", SimpleFrozenList=list,
                   registry=_spacy_registry_placeholder)
class _Language(_Stub):
    @staticmethod
    def factory(*a, **k):
        return lambda fn: fn
    @staticmethod
    def component(*a, **k):
        return lambda fn: fn
_spacy.language = shim("spacy.language", Language=_Language)
class _SpacyDoc(_Stub):
    @staticmethod
    def set_extension(*a, **k): pass
class _SpacySpan(_Stub):
    @staticmethod
    def set_extension(*a, **k): pass
class _SpacyToken(_Stub):
    @staticmethod
    def set_extension(*a, **k): pass
_spacy.tokens = shim("spacy.tokens", Doc=_SpacyDoc, Span=_SpacySpan,
                     Token=_SpacyToken, SpanGroup=_Stub)
_spacy.lang = shim("spacy.lang")
_spacy.lang.char_classes = shim("spacy.lang.char_classes",
    LIST_ELLIPSES=[], LIST_ICONS=[], CONCAT_QUOTES="", ALPHA_LOWER="a-z",
    ALPHA_UPPER="A-Z", ALPHA="a-zA-Z", HYPHENS="-")
class _EnglishDefaults(_Stub):
    suffixes = []
    infixes = []
    prefixes = []
_spacy.lang.en = shim("spacy.lang.en", English=_Stub,
                      EnglishDefaults=_EnglishDefaults)
import string as _string
shim("spacy.lang.en.tokenizer_exceptions",
     TOKENIZER_EXCEPTIONS={c + ".": [] for c in _string.ascii_lowercase})
shim("tqdm", tqdm=lambda x, **k: x)
shim("tokenizers", Encoding=_Stub)
shim("ahocorasick", Automaton=_Stub)
shim("srsly", read_json=lambda *a, **k: {}, write_json=lambda *a, **k: None,
     read_jsonl=lambda *a, **k: [], write_jsonl=lambda *a, **k: None)
_rdf = shim("rdflib", Graph=_Stub, URIRef=_Stub, Literal=_Stub, BNode=_Stub,
            Namespace=_Stub)
_rdf.query = shim("rdflib.query", ResultRow=_Stub)

sys.path.insert(0, "/root/reference")

"""Hashed char-trigram language ID (stages/langid_ngram): held-out
classification across all 10 seed languages, integer-exact scoring
properties, degenerate inputs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vertex_ray.stages.langid_ngram import (
    LANGID_SEEDS,
    langid_classify,
    langid_train_table,
    train_langid,
)

# held-out sentences (NOT in the seeds) per language
HELD_OUT = {
    "de": "bitte öffnen sie das fenster weil es hier sehr warm ist",
    "en": "please open the window because it is very warm in here",
    "es": "por favor abre la ventana porque hace mucho calor aquí",
    "fr": "ouvrez la fenêtre s'il vous plaît parce qu'il fait très chaud",
    "id": "tolong buka jendelanya karena di sini sangat panas sekali",
    "it": "per favore apri la finestra perché fa molto caldo qui dentro",
    "nl": "doe alsjeblieft het raam open want het is hier erg warm",
    "pt": "por favor abra a janela porque está muito calor aqui dentro",
    "sv": "öppna fönstret är du snäll eftersom det är mycket varmt här",
    "tr": "lütfen pencereyi açar mısınız çünkü burası çok sıcak oldu",
}


def _model(ray_session):
    train = rd.from_arrow(langid_train_table())
    return train_langid(train, n_buckets=4096)


def test_classifies_held_out_sentences(ray_session):
    langs, q, _ = _model(ray_session)
    assert len(langs) == 10
    docs = pa.table({
        "doc_id": pa.array(list(range(len(HELD_OUT))), pa.int64()),
        "text": pa.array(list(HELD_OUT.values()), pa.string()),
    })
    out = (langid_classify(rd.from_arrow(docs), langs, q)
           .to_pandas().sort_values("doc_id"))
    got = out["lang"].tolist()
    want = list(HELD_OUT.keys())
    # ≥8/10 held-out sentences must classify correctly (trigram NB on
    # 5 seed sentences per language; es/pt are the close pair)
    correct = sum(g == w for g, w in zip(got, want))
    assert correct >= 8, list(zip(want, got))
    # the easy, distinctive ones must always be right
    for lang in ("de", "en", "tr", "sv", "nl"):
        assert got[want.index(lang)] == lang


def test_scores_are_integer_and_deterministic(ray_session):
    langs, q, q0 = _model(ray_session)
    assert q.dtype == np.int64 and q0.dtype == np.int64
    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["the quick brown fox"],)})
    a = langid_classify(rd.from_arrow(docs), langs, q).to_pandas()
    b = langid_classify(rd.from_arrow(docs), langs, q).to_pandas()
    assert a["score"].tolist() == b["score"].tolist()
    assert a["lang"].iloc[0] == "en"


def test_degenerate_documents(ray_session):
    langs, q, _ = _model(ray_session)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["", "ab", "   "], pa.string()),
    })
    out = (langid_classify(rd.from_arrow(docs), langs, q)
           .to_pandas().sort_values("doc_id"))
    assert out["lang"].tolist() == ["und", "und", "und"]
    assert out["score"].tolist() == [0, 0, 0]
    assert out["n_grams"].tolist() == [0, 0, 0]


def test_train_empty_raises(ray_session):
    import pytest

    empty = pa.table({"lang": pa.array([], pa.string()),
                      "text": pa.array([], pa.string())})
    with pytest.raises(Exception):
        train_langid(rd.from_arrow(empty))

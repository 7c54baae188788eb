"""Naive-Bayes classifier (ops/classify.py): learning on a planted signal,
batch/partition invariance, and prior-only behavior on uninformative text.
The sf0.01 hash match vs the serial twin runs via test_entry's ORACLE_SQL
parametrization."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cloud_crawler_ray.ops.classify import nb_classify, nb_score_batch, nb_train

CLASS_WORDS = {
    "alpha": ["apple", "anchor", "arrow", "amber"],
    "beta": ["bridge", "basket", "bottle", "breeze"],
    "gamma": ["garden", "gravel", "goblet", "galaxy"],
}
NOISE = ["the", "a", "of", "run", "value", "table"]


def _planted_docs(n_per_class: int = 40) -> pa.Table:
    rng = np.random.default_rng(11)
    ids, texts, labels = [], [], []
    for c, (lang, words) in enumerate(sorted(CLASS_WORDS.items())):
        for i in range(n_per_class):
            toks = list(rng.choice(words, size=6)) + list(rng.choice(NOISE, size=4))
            rng.shuffle(toks)
            ids.append(c * n_per_class + i)
            texts.append(" ".join(toks))
            labels.append(lang)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(labels, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def planted():
    return _planted_docs()


def test_nb_learns_planted_signal(ray_session, planted):
    out = nb_classify(rd.from_arrow(planted)).to_pandas()
    acc = (out["lang"] == out["pred"]).mean()
    assert acc >= 0.95, acc


def test_nb_partition_invariance(ray_session, planted):
    outs = []
    for blocks in (1, 8):
        ds = rd.from_arrow(planted).repartition(blocks)
        df = nb_classify(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1])


def test_nb_prior_only_on_empty_text(ray_session, planted):
    # docs with no tokens score logprior only → majority class, and the
    # score kernel handles the empty-flat-array path
    langs, logp, logprior = nb_train(rd.from_arrow(planted))
    pred = nb_score_batch(["", "   "], logp, logprior)
    majority = int(np.argmax(logprior))
    assert list(pred) == [majority, majority]
    assert langs == sorted(CLASS_WORDS)

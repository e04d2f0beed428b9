"""Learned language-ID profiles (VERDICT r02 #4).

The hardcoded ``LANG_TRIGRAMS`` stand-ins stay as the driver-oracle entry
(`lang_id_ngram` with default profiles); ``train_lang_profiles`` is the
production path — a distributed count job producing per-language trigram
profiles behind the same interface.  These tests train on a labeled
synthetic multilingual corpus and require >95% held-out accuracy.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from search_engine_spark.operators.text_quality import (
    LANG_TRIGRAMS,
    lang_id_ngram,
    train_lang_profiles,
)
from search_engine_spark.sources.synth import (
    LANG_WORDS,
    synth_multilingual_df,
)


@pytest.fixture(scope="module")
def multilingual(spark):
    df = synth_multilingual_df(spark, 60).cache()
    df.count()
    return df


def _accuracy(pred_df, truth_df) -> float:
    joined = pred_df.join(truth_df.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    correct = joined.filter(F.col("pred_lang") == F.col("lang")).count()
    return correct / n


def test_trained_profiles_heldout_accuracy(spark, multilingual):
    train = multilingual.filter(F.col("doc_id") % 5 != 0)
    held = multilingual.filter(F.col("doc_id") % 5 == 0)
    profs = train_lang_profiles(train, top_n=40)
    assert set(profs) == set(LANG_WORDS)
    assert all(len(v) == 40 for v in profs.values())
    acc = _accuracy(lang_id_ngram(held, profiles=profs), held)
    assert acc > 0.95, f"held-out accuracy {acc}"


def test_trained_profiles_deterministic_across_partitioning(spark, multilingual):
    train = multilingual.filter(F.col("doc_id") % 5 != 0)
    p1 = train_lang_profiles(train.coalesce(1), top_n=25)
    p8 = train_lang_profiles(train.repartition(8), top_n=25)
    assert p1 == p8


def test_default_profiles_are_the_hardcoded_standins(spark, multilingual):
    """profiles=None must keep the oracle-embedded stand-ins byte-for-byte
    (the driver's lang_id_ngram SQL oracle embeds LANG_TRIGRAMS verbatim)."""
    held = multilingual.filter(F.col("doc_id") % 7 == 0)
    default = lang_id_ngram(held).orderBy("doc_id").collect()
    explicit = lang_id_ngram(held, profiles=LANG_TRIGRAMS).orderBy("doc_id").collect()
    assert default == explicit


def test_trained_beats_standins_on_multilingual(spark, multilingual):
    """The stand-ins were tuned for the driver's English-ish documents
    table; learned profiles must not be WORSE on a real multilingual mix."""
    train = multilingual.filter(F.col("doc_id") % 5 != 0)
    held = multilingual.filter(F.col("doc_id") % 5 == 0)
    profs = train_lang_profiles(train, top_n=40)
    acc_learned = _accuracy(lang_id_ngram(held, profiles=profs), held)
    acc_standin = _accuracy(lang_id_ngram(held), held)
    assert acc_learned >= acc_standin

"""Engine infra: settings merge, Run context, provenance
(`third_party/ColBERT/colbert/infra/`)."""

import json
import os

import pytest

from reranking_multimodal_retrievers_tpu.engine.infra import (
    EngineConfig, Provenance, Run,
)


@pytest.fixture(autouse=True)
def fresh_run():
    Run._reset_for_tests()
    yield
    Run._reset_for_tests()


def test_config_defaults_match_reference_vocabulary():
    cfg = EngineConfig.make()
    # `settings.py` defaults: dim 128, doc_maxlen 220, query_maxlen 32,
    # nway 2, nbits 1, kmeans_niters 20
    assert (cfg.dim, cfg.doc_maxlen, cfg.query_maxlen) == (128, 220, 32)
    assert (cfg.nway, cfg.nbits, cfg.kmeans_niters) == (2, 1, 20)
    assert cfg.use_ib_negatives is False and cfg.mask_punctuation is True


def test_from_existing_explicit_fields_win():
    base = EngineConfig.make(doc_maxlen=300, nway=4)
    override = EngineConfig.make(nway=8)
    merged = EngineConfig.from_existing(base, override)
    assert merged.doc_maxlen == 300       # kept from base
    assert merged.nway == 8               # overridden
    assert merged.dim == 128              # default never clobbered
    # defaults of the override must NOT clobber base's explicit values
    assert EngineConfig.from_existing(base, EngineConfig.make()).doc_maxlen == 300


def test_config_save_load_roundtrip(tmp_path):
    cfg = EngineConfig.make(experiment="e1", nbits=2, index_name="idx")
    p = str(tmp_path / "meta.json")
    cfg.save(p)
    again = EngineConfig.load(p)
    assert again.nbits == 2 and again.index_name == "idx"
    assert again.index_path_.endswith(os.path.join("indexes", "idx"))


def test_run_context_nesting_and_paths(tmp_path):
    run = Run()
    assert run.config.experiment == "default"
    with run.context(EngineConfig.make(root=str(tmp_path), experiment="exp",
                                       name="run1", overwrite=True)):
        assert run.path_ == os.path.join(str(tmp_path), "exp", "run1")
        assert run.experiment == "exp"  # attribute passthrough
        with run.context(EngineConfig.make(nway=6)):
            # inherits enclosing run settings, overrides nway
            assert run.config.experiment == "exp" and run.config.nway == 6
        with run.open("artifact.json", "w") as f:
            json.dump({"x": 1}, f)
        assert os.path.exists(os.path.join(run.path_, "artifact.json"))
    assert run.config.experiment == "default"  # popped


def test_run_open_refuses_overwrite(tmp_path):
    run = Run()
    with run.context(EngineConfig.make(root=str(tmp_path), experiment="e",
                                       name="n")):
        with run.open("a.txt", "w") as f:
            f.write("x")
        with pytest.raises(AssertionError):
            run.open("a.txt", "w")


def test_provenance(tmp_path):
    prov = Provenance().attach(config={"nway": 2}, source="unit-test")
    d = prov.todict()
    assert d["source"] == "unit-test" and d["config"]["nway"] == 2
    assert any("test_engine_infra" in fr for fr in d["stacktrace"])
    p = str(tmp_path / "prov.json")
    prov.save(p)
    assert json.load(open(p))["provenance"]["created_at"]


def test_plain_constructor_counts_as_fully_explicit():
    """A plain EngineConfig(...) (no .make) contributes ALL its fields when
    merged — the natural constructor semantics."""
    base = EngineConfig.make(doc_maxlen=300)
    merged = EngineConfig.from_existing(base, EngineConfig(nway=8))
    assert merged.nway == 8
    # the plain config's dataclass defaults clobber too (it is "all explicit")
    assert merged.doc_maxlen == 220
    run = Run()
    with run.context(EngineConfig(nway=6, root="r", experiment="e", name="n")):
        assert run.config.nway == 6 and run.config.experiment == "e"


def test_plain_config_auto_name_does_not_clobber_on_merge():
    """ADVICE r1: a default-constructed EngineConfig's auto-timestamped name
    must not overwrite an explicit name during from_existing merges."""
    base = EngineConfig.make(name="keep-me", doc_maxlen=300)
    merged = EngineConfig.from_existing(base, EngineConfig(nway=8))
    assert merged.name == "keep-me"
    assert merged.nway == 8
    # an EXPLICIT name on a plain config still wins
    merged2 = EngineConfig.from_existing(base, EngineConfig(name="new"))
    assert merged2.name == "new"

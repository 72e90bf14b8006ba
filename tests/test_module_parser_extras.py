"""ModuleParser variant coverage: the parser/postprocessor vocabulary beyond
the core seven (reference `module_parser.py:79,247,374-505,530-704,933-987`)."""

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.data.module_parser import ModuleParser


class _Host(ModuleParser):
    """Minimal host exposing config + tokenizers the mixin expects."""

    def __init__(self, tokenizer=None, decoder_tokenizer=None, image_processor=None):
        self.config = {"max_source_length": 32, "max_target_length": 8,
                       "max_decoder_source_length": 24}
        self.tokenizer = tokenizer
        self.decoder_tokenizer = decoder_tokenizer
        self.image_processor = image_processor


@pytest.fixture(scope="module")
def bert_tok(tmp_path_factory):
    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        tiny_bert_tokenizer,
    )

    words = ["what", "is", "this", "where", "the", "dog", "a", "passage",
             "another", "here", "yes", "no", "capital", ":", "?"]
    return tiny_bert_tokenizer(str(tmp_path_factory.mktemp("tok")), words)


def test_empty_text_and_passage_vision_parsers():
    host = _Host()
    assert host.EmptyTextInput({}, {})["text_sequence"] == ""
    feats = host.PassageVisionInput(
        {"passage_image_features": [1.0, 2.0]}, {"option": "from_embeddings"}
    )
    np.testing.assert_array_equal(feats["image_features"], [1.0, 2.0])
    assert host.PassageVisionInput({}, {})["images"] == []


def test_decoder_and_output_tokenization(bert_tok):
    host = _Host(decoder_tokenizer=bert_tok)
    dec = host.PostProcessDecoderInputTokenization(
        {"text_sequences": ["a passage", "another passage here"]}, {"max_length": 12}
    )
    assert dec["decoder_input_ids"].shape == (2, 12)
    out = host.PostProcessOutputTokenization(
        {"text_sequences": ["yes", "no"]}, {"max_length": 6}
    )
    # pad positions are -100 in labels but raw ids in output_sequence_ids
    assert (out["labels"] == -100).any()
    assert not (out["output_sequence_ids"] == -100).any()
    assert out["labels"].shape == out["output_sequence_ids"].shape
    blip = host.PostProcessBlipOutputTokenization(
        {"text_sequences": ["yes", "no"]}, {"max_length": 6}
    )
    np.testing.assert_array_equal(blip["labels"], out["labels"])


def test_llava_tokenization_masks(bert_tok):
    host = _Host(tokenizer=bert_tok)
    res = host.PostProcessLLaVAQuestionInputTokenization(
        {"text_sequences": ["what is this?", "where is the dog?"]},
        {"max_length": 32, "img_token_span": 4},
    )
    assert res["input_ids"].shape == (2, 32)
    # masks cover the extended (text + image-span) sequence
    assert res["image_mask"].shape[1] == 32 + 4 - 1
    assert res["instruction_mask"].shape == res["image_mask"].shape
    assert res["question_mask"].shape == res["image_mask"].shape
    assert (res["image_mask"].sum(axis=1) == 4).all()
    # instruction / question / image masks are pairwise disjoint
    assert not ((res["instruction_mask"] > 0) & (res["question_mask"] > 0)).any()
    assert not ((res["image_mask"] > 0) & (res["question_mask"] > 0)).any()


def test_qwen_tokenization(bert_tok):
    host = _Host(tokenizer=bert_tok)
    res = host.PostProcessQWenQuestionInputTokenization(
        {"text_sequences": ["what is this?"]}, {"max_length": 24}
    )
    assert res["input_ids"].shape == (1, 24)


def test_vision_from_embeddings_postprocessors():
    host = _Host()
    feats = [np.ones(4), np.zeros(4)]
    out = host.PostProcessVisionInputFromEmbeddings({"image_features": feats}, {})
    assert out["image_features"].shape == (2, 4)
    out2 = host.PostProcessItemVisionInputFromEmbeddings({"image_features": feats}, {})
    assert out2["item_image_features"].shape == (2, 4)


def test_colbert_aliases_match_flmr(bert_tok):
    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        FLMRQueryTokenizer,
    )

    host = _Host(tokenizer=FLMRQueryTokenizer(bert_tok, query_maxlen=16))
    data = {"text_sequences": ["what is the capital?"]}
    a = host.PostProcessFLMRQuestionInputTokenization(data, {"max_length": 16})
    b = host.PostProcessColBERTQuestionInputTokenization(data, {"max_length": 16})
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])


def test_decoder_side_vision_reaches_postprocessors(bert_tok):
    """Passage-side vision inputs must flow into the decoder postprocess
    dict — previously collate only passed text_sequences and the vision
    postprocessors silently returned {} (text-only training, no error)."""
    from reranking_multimodal_retrievers_tpu.data.datasets import BaseDataset

    rows = [
        {"question": "what is this", "passage_content": "a passage",
         "passage_image_features": [1.0, 2.0, 3.0, 4.0]},
        {"question": "where is the dog", "passage_content": "another",
         "passage_image_features": [5.0, 6.0, 7.0, 8.0]},
    ]
    mc = {
        "input_modules": [{"type": "QuestionInput", "option": "default"}],
        "postprocess_module_list": [
            {"type": "PostProcessInputTokenization", "max_length": 12},
        ],
        "decoder_input_modules": [
            {"type": "KnowledgeInput"},
            {"type": "PassageVisionInput", "option": "from_embeddings"},
        ],
        "postprocess_decoder_input_module_list": [
            {"type": "PostProcessDecoderInputTokenization", "max_length": 12},
            {"type": "PostProcessItemVisionInputFromEmbeddings"},
        ],
    }
    ds = BaseDataset({"max_source_length": 12}, rows, mc,
                     tokenizer=bert_tok, decoder_tokenizer=bert_tok)
    batch = ds.collate_fn(rows)
    assert "decoder_item_image_features" in batch
    assert batch["decoder_item_image_features"].shape == (2, 4)


def test_clip_processor_float_images():
    """Float [0,1] images must be rescaled, not truncated to black."""
    from reranking_multimodal_retrievers_tpu.data.loaders import (
        CLIPImageProcessorNP,
    )

    proc = CLIPImageProcessorNP(image_size=32)
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    img_f = img_u8.astype(np.float32) / 255.0
    out_u8 = proc([img_u8])
    out_f = proc([img_f])
    np.testing.assert_allclose(out_f, out_u8, atol=1e-5)
    # non-degenerate output (not all-black post-normalization constant)
    assert np.std(out_f) > 0.1

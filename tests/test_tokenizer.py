import numpy as np

from mpreid_tpu.models.tokenizer import get_tokenizer, tokenize, CONTEXT_LENGTH


def test_known_clip_token_ids():
    # Golden values from the published CLIP tokenizer.
    toks = tokenize("a photo of a person.")[0]
    assert toks[0] == 49406  # <|startoftext|>
    assert list(toks[1:8]) == [320, 1125, 539, 320, 2533, 269, 49407]
    assert toks[8:].sum() == 0


def test_prompt_template_shape():
    from mpreid_tpu.models.uniprompt import prompt_template_tokens, N_TOTAL_CTX

    toks = prompt_template_tokens()
    assert toks.shape == (1, CONTEXT_LENGTH)
    tok = get_tokenizer()
    x_id = tokenize("X")[0, 1]
    xs = np.where(toks[0] == x_id)[0]
    assert len(xs) == N_TOTAL_CTX
    assert xs[0] == 1  # right after SOT
    # suffix: "person." then EOT
    assert toks[0, xs[-1] + 1] == 2533
    assert toks[0, xs[-1] + 2] == 269
    assert toks[0, xs[-1] + 3] == tok.eot_token


def test_roundtrip():
    tok = get_tokenizer()
    ids = tok.encode("hello world!!")
    # byte-BPE decode re-inserts word-boundary spaces ("</w>" → " ")
    assert tok.decode(ids).strip() == "hello world !!"


def test_eot_is_argmax():
    toks = tokenize(["a cat", "a much longer sentence about a person"])
    assert (toks.argmax(axis=-1) == (toks == 49407).argmax(axis=-1)).all()

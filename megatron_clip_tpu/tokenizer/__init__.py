from megatron_clip_tpu.tokenizer.clip_bpe import (  # noqa: F401
    SimpleTokenizer, HFTokenizer, tokenize, get_tokenizer, find_bpe_vocab,
    SOT_TOKEN, EOT_TOKEN, VOCAB_SIZE,
)

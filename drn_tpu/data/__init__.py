from drn_tpu.data.vocab import Vocab, tokenize  # noqa: F401
from drn_tpu.data.pipeline import BatchIterator, make_dataset  # noqa: F401

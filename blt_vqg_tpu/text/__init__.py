from blt_vqg_tpu.text.vocabulary import Vocabulary, load_vocab
from blt_vqg_tpu.text.tokenizer import tokenize, process_text
from blt_vqg_tpu.text.glove import (load_glove_embeddings,
                                    get_glove_embedding)

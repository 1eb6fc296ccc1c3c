from cvc_tpu.evaluation.tokenizer import ptb_tokenize
from cvc_tpu.evaluation.bleu import corpus_bleu
from cvc_tpu.evaluation.cider import CiderD
from cvc_tpu.evaluation.meteor import corpus_meteor, meteor_score, porter_stem
from cvc_tpu.evaluation.language_eval import language_eval
from cvc_tpu.evaluation.grounding import grounding_eval

__all__ = ["ptb_tokenize", "corpus_bleu", "CiderD", "corpus_meteor", "meteor_score", "porter_stem",
           "language_eval", "grounding_eval"]

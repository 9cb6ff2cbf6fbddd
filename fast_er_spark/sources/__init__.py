from .corpus import CORPUS_COLUMNS, read_corpus, write_corpus

__all__ = ["CORPUS_COLUMNS", "read_corpus", "write_corpus"]

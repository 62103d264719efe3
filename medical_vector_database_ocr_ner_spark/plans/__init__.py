from .pipeline import build_embeddings, search_topk, corpus_stats, entity_type_histogram

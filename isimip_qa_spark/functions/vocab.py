"""Frozen per-language content vocabularies.

Shared by the synthetic pages generator (sources/pages.py), the perplexity
model (functions/perplexity.py — in-vocabulary tokens score well, gibberish
stays OOV), and tests. Part of the deterministic fixture contract.
"""

CONTENT_WORDS: dict[str, list[str]] = {
    "en": ["stream", "quality", "filter", "crawl", "corpus", "token", "model",
           "batch", "shard", "merge", "index", "score"],
    "es": ["calidad", "filtro", "rastreo", "texto", "modelo", "datos",
           "lote", "indice", "puntaje", "fuente", "pagina", "red"],
    "fr": ["qualite", "filtre", "texte", "modele", "donnees", "source",
           "page", "reseau", "score", "jeton", "corpus", "index"],
    "de": ["qualitat", "filter", "text", "modell", "daten", "quelle",
           "seite", "netz", "punkte", "zeichen", "korpus", "index"],
    "zh": ["质量", "过滤", "文本", "模型", "数据", "来源",
           "页面", "网络", "分数", "标记", "语料", "索引"],
}

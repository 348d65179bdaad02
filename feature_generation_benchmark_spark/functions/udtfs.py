"""Python user-defined table functions (Spark 4 UDTF API).

Completes the Python-extensibility surface next to the Python Data Source
connector (``sources/pydatasource.py``): scalar Python (pandas UDFs),
grouped Python (``applyInPandas``/``applyInArrow``), per-partition Python
(``mapInPandas``/``mapInArrow``), source-side Python (Data Source API), and
— here — table-function Python, usable from SQL via ``LATERAL``.

The splitting rule is regex-deterministic so the DuckDB oracle reproduces
rows exactly. Scale note: UDTFs evaluate row-at-a-time in Python — for
hot-path splitting the engine's built-in flatMap form (``doc_chunking``,
``sequence``→``explode``) is the 100 TB path; the UDTF exists for logic
that genuinely needs imperative per-row expansion and for API parity.
"""

from __future__ import annotations

import re

_SENT_SPLIT = re.compile(r"[.!?]+")
_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")
_STRIP = " \t\r\n"


class SentenceSplit:
    """Emit (sent_idx, sentence, n_tokens) per sentence of ``text``.

    Registered as the SQL table function ``sentence_split`` (see
    :func:`register_udtfs`); rows follow the canonical tokenization rule
    shared with the DuckDB oracles (textfns module docstring).
    """

    def eval(self, text: str):  # noqa: A002 - UDTF contract
        if text is None:
            return
        idx = 0
        for raw in _SENT_SPLIT.split(text):
            sent = raw.strip(_STRIP)
            if not sent:
                continue
            idx += 1
            toks = [t for t in _TOKEN_SPLIT.split(sent.lower()) if t]
            yield idx, sent, len(toks)


def register_udtfs(spark, use_arrow: bool = True) -> None:
    """Idempotently register the engine's UDTFs on ``spark``.

    ``use_arrow=True`` (default) requests Spark 4's Arrow-optimized UDTF
    evaluation — output rows cross the Python boundary as Arrow batches
    instead of pickled rows, the same ~10× transfer win as pandas UDFs.
    Falls back to the pickled path on builds without the parameter.
    """
    from pyspark.sql.functions import udtf

    schema = "sent_idx BIGINT, sentence STRING, n_tokens BIGINT"
    try:
        fn = udtf(SentenceSplit, returnType=schema, useArrow=use_arrow)
    except TypeError:  # older API without useArrow
        fn = udtf(SentenceSplit, returnType=schema)
    spark.udtf.register("sentence_split", fn)

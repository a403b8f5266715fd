"""Arrow-kernel plumbing shared by the vectorized operators.

One recurring trap: modules here use ``from __future__ import
annotations`` (PEP 563), so a pandas-UDF's type hints are *strings* at
decoration time; PySpark resolves them with ``typing.get_type_hints``
against the function's **module** globals, and the kernels import
pandas locally — the lookup NameErrors and PySpark raises
``UNSUPPORTED_SIGNATURE``. :func:`series_pandas_udf` assigns real
``pd.Series`` objects to ``__annotations__`` before wrapping, which
sidesteps resolution entirely. Every Series→Series kernel in the
package goes through it.
"""

from __future__ import annotations


def series_pandas_udf(fn, return_type: str):
    """Wrap a ``pd.Series -> pd.Series`` kernel as a scalar pandas UDF
    of ``return_type``, immune to PEP 563 string annotations (see
    module docstring). Mutates ``fn.__annotations__`` in place — pass
    a dedicated kernel function or lambda, not one shared with other
    callers."""
    import inspect

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    params = list(inspect.signature(fn).parameters)
    fn.__annotations__ = {**{p: pd.Series for p in params},
                          "return": pd.Series}
    return pandas_udf(fn, return_type)

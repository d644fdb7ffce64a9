"""Analysis & reporting layer (L5): RSA/probing, regressions, figures.

Capability parity: reference pig/grsa.py, pig/stats.py, pig/plotting.py.
Everything here is host-side numpy/pandas/sklearn/matplotlib over result
files produced by the evaluation layer; statsmodels/plotnine (reference deps)
are replaced by a self-contained OLS (analysis/ols.py) and matplotlib.
"""

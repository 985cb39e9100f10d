"""Vectorized planar geometry kernel (numpy; no GEOS available).

The reference runs planar-only (`sf_use_s2(FALSE)`,
/root/reference/R/scale_process.R:107), so an exact planar kernel is
semantically faithful. All functions operate on numpy arrays inside
Arrow-batched pandas UDFs — never per-row Python.
"""

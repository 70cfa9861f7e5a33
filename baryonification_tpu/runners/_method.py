"""Shared fast-path method dispatch for the runner families.

Every runner family resolves ``method`` the same way: ``'auto'`` picks
the cell-major fast path on accelerators when the configuration is
eligible, warns and falls back to the family's reference-semantics slow
method when it is not (naming the reason — silent 10-70x regressions
are undiagnosable, VERDICT r3 directive 7), and always uses the slow
method on CPU; an EXPLICIT ``method='cellmajor'`` request that is
ineligible raises with the same reason. One implementation so the
eligibility rules and messages cannot drift between families.
"""

import warnings

import jax

__all__ = ["resolve_method"]


def resolve_method(method, why_not, slow_name):
    """Resolve a runner ``method`` kwarg against fast-path eligibility.

    method : 'auto' | 'cellmajor' | the family's other method names
             (passed through untouched).
    why_not : None if the cell-major path supports this configuration,
              else a short reason string (it becomes the warning /
              error text, so keep it grep-able: tests match on it).
    slow_name : the family's reference-semantics fallback
                ('scatter' for shell/grid, 'gather' for snapshot).
    """
    if method == "auto":
        if jax.default_backend() == "cpu":
            return slow_name
        if why_not is None:
            return "cellmajor"
        warnings.warn(
            f"falling back to the '{slow_name}' method ({why_not}); "
            f"expect a ~5-70x slowdown on accelerators (see the README "
            f"performance table)")
        return slow_name
    if method == "cellmajor" and why_not is not None:
        raise ValueError(f"method='cellmajor' unsupported here: "
                         f"{why_not}; use '{slow_name}'")
    return method

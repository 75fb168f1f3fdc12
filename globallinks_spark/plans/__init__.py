"""Plan inspection: assert the physical properties that matter at scale
(pushdown, pruning, broadcast, codegen) instead of hoping for them."""

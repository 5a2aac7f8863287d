"""Committed-workload harnesses: the reference's own shapes graphs validated
end-to-end against deterministic, oracle-mirrorable ABoxes."""

def solve_cora(*args, **kwargs):
    raise NotImplementedError("staircase solver lands in the next milestone")

Size = tuple[int, int]

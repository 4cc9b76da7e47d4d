M = (1<<64) - 1
def splitmix_comp(seed, b, j):
    z = (seed + b*0x9E3779B97F4A7C15 + j*0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    z = z ^ (z >> 31)
    return 1.0 if (z & 1) == 0 else -1.0

def comps_list(seed, bits, dim):
    return [[splitmix_comp(seed, b, j) for j in range(dim)] for b in range(bits)]

def bucket_sql(vcol, seed, bits, dim):
    terms = []
    for b in range(bits):
        arr = "[" + ",".join("1.0" if c > 0 else "-1.0" for c in comps_list(seed, bits, dim)[b]) + "]"
        terms.append(f"(CASE WHEN list_dot_product({vcol}, {arr}) >= 0 THEN {1<<b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"

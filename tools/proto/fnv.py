M64 = 18446744073709551616
OFFSET = 14695981039346656037
PRIME = 1099511628211

def splitmix(i):
    M = M64 - 1
    z = (i + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)

def step(acc, c):
    """one FNV-1a step in DuckDB HUGEINT SQL; acc: HUGEINT expr, c: char-code expr"""
    return (f"((({acc}) // 65536 * 65536 + "
            f"xor(CAST(({acc}) % 65536 AS BIGINT), CAST(({c}) AS BIGINT))) "
            f"* {PRIME}) % {M64}::HUGEINT")

def fnv5(textcol, i):
    """FNV-1a of the 5-char shingle at 1-based position i of textcol"""
    acc = f"{OFFSET}::HUGEINT"
    for k in range(5):
        acc = step(acc, f"ord(substr({textcol}, CAST({i}+{k} AS INT), 1))")
    return acc

def rotl_xor_signed(h, i):
    """signed(rotl(h, r_i) ^ salt_i) for minhash mix i; h unsigned HUGEINT expr"""
    r = (i * 23 + 17) % 63 + 1
    salt = splitmix(i)
    hi, lo = salt >> 32, salt & 0xFFFFFFFF
    rot = f"(({h}) % {1 << (64 - r)}::HUGEINT * {1 << r}::HUGEINT + ({h}) // {1 << (64 - r)}::HUGEINT)"
    x = (f"(CAST(xor(CAST({rot} // 4294967296 AS BIGINT), {hi}) AS HUGEINT) * 4294967296 "
         f"+ CAST(xor(CAST({rot} % 4294967296 AS BIGINT), {lo}) AS HUGEINT))")
    return f"CAST(CASE WHEN {x} >= 9223372036854775808::HUGEINT THEN {x} - {M64}::HUGEINT ELSE {x} END AS BIGINT)"

# token FNV via list_reduce over char codes
def fnv_token(tok):
    st = step("acc", "c")
    return (f"list_reduce(list_prepend({OFFSET}::HUGEINT, "
            f"list_transform(range(1, length({tok})+1), i -> CAST(ord(substr({tok}, CAST(i AS INT), 1)) AS HUGEINT))), "
            f"(acc, c) -> {st})")

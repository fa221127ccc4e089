"""Site profiles — the reference's per-shop configuration, data-only.

Mirrors the ``shop`` struct + functional options
(`/root/reference/pkg/scraper/shopcrawler.go:7-58`) and the two concrete
shops (`pkg/scraper/mixup.go:21-42`, `pkg/scraper/amazon.go:41-72`).
The Go regexes below are RE2∩Python-safe; tests pin their behavior
against known URL lists so the dialects cannot drift silently.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SiteProfile:
    name: str
    source_store: str
    domain_glob: str
    link_extraction_query: str  # colly URLFilters (admission regex, F2)
    link_product_query: str  # product-page classifier (F3)
    allowed_domains: tuple[str, ...]  # exact host strings (F1)
    link_selector: str  # CSS selector feeding frontier expansion (E1)
    keywords_value: str = "Keywords"
    description_value: str = "Description"
    # True when the regexes mean the same thing in Java (Spark rlike) as
    # in RE2/Python — admission then runs JVM-side in whole-stage codegen.
    # False (amazon: nested-[ character classes differ) -> vectorized
    # pandas UDF with Python re, which matches RE2 for these patterns.
    java_safe: bool = False

    @property
    def link_re(self) -> re.Pattern:
        return re.compile(self.link_extraction_query)

    @property
    def product_re(self) -> re.Pattern:
        return re.compile(self.link_product_query)


# mixup.go:24-34 (regexes :28-29; allowedDomains :30-34; link selector :85)
MIXUP = SiteProfile(
    name="mixup",
    source_store="Mixup",
    domain_glob="*mixup.*",
    link_extraction_query=r"(?m)https://www\.mixup\.com\.mx/[Mm]ixup/(([Hh]ome\.aspx)|((Categoria|Productos)\.aspx\?(etq\=))|(detproducto\.aspx\?sku=\d+)$)",
    link_product_query=r"(?m)(https://www\.mixup\.com\.mx/[Mm]ixup/)(detproducto\.aspx\?sku=\d{12,})$",
    allowed_domains=(
        "https://www.mixup.com.mx",
        "www.mixup.com.mx",
        "mixup.com.mx",
    ),
    link_selector="a[href]",
    java_safe=True,
)

# amazon.go:43-65 (regexes :45-46; allowedDomains :47-64; link selector :101)
AMAZON = SiteProfile(
    name="amazon",
    source_store="Amazon",
    domain_glob="*amazon.*",
    link_extraction_query=r"(?m)https:\/\/www\.amazon\.(com\.mx|mx|es|co\.uk|com)\/(s[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+$)|([\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+dp[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+)",
    link_product_query=r"(?m)https:\/\/www\.amazon\.(?:com\.mx|mx|es|co\.uk|com)\/(?:[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+(dp/\w{10})[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+)",
    allowed_domains=(
        "https://www.amazon.com.mx",
        "www.amazon.com.mx",
        "amazon.com.mx",
        "https://www.amazon.com",
        "www.amazon.com",
        "amazon.com",
        "https://www.amazon.co.uk",
        "www.amazon.co.uk",
        "amazon.co.uk",
        "https://www.amazon.es",
        "www.amazon.es",
        "amazon.es",
    ),
    link_selector="div.s-main-slot.s-result-list.s-search-results.sg-row a[href]",
)

# The sandbox corpus adds synthetic hosts that follow the two shapes above;
# SyntheticProfile generalizes the Mixup shape to host `shop{k}.example`.
def synthetic_profile(hosts: tuple[str, ...]) -> SiteProfile:
    """Profile over the deterministic synthetic corpus (datagen.py).

    URL shapes mirror the Mixup site structure (Home / Categoria /
    detproducto?sku=...) so every reference filter/extractor is exercised,
    but across many hosts so politeness + skew are observable.
    """
    return SiteProfile(
        name="synthetic",
        source_store="Mixup",
        domain_glob="*.example",
        # host part is a wildcard: the F1 allowlist already constrains
        # hosts exactly, so F1 AND F2 is unchanged — and the admission
        # regex stays O(1) in the host count (an alternation of hundreds
        # of hosts would dominate the scheduling hot path)
        # the host class admits bracketed IPv6 literals ([2001:db8::7])
        # alongside reg-names — identical in Java and RE2/Python
        link_extraction_query=(
            r"(?m)https://([a-z0-9.:\[\]-]+)/[Mm]ixup/"
            r"(([Hh]ome\.aspx)|((Categoria|Productos)\.aspx\?(etq\=))|(detproducto\.aspx\?sku=\d+)$)"
        ),
        link_product_query=(
            r"(?m)(https://(?:[a-z0-9.:\[\]-]+)/[Mm]ixup/)"
            r"(detproducto\.aspx\?sku=\d{12,})$"
        ),
        allowed_domains=hosts,
        link_selector="a[href]",
        java_safe=True,
    )


PROFILES = {"mixup": MIXUP, "amazon": AMAZON}

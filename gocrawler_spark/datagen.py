"""Deterministic synthetic web corpus (seed-free: pure hash functions).

Two corpora, both derived from identifiers via md5 so any subset is
reproducible without RNG state (FIXTURES.md §1):

* :func:`parity_pages` — handcrafted Mixup/Amazon-shaped pages exercising
  every extractor (E1-E10, F8/F9 edge cases). Small; unit tests.
* :func:`crawl_corpus` — a host-skewed site graph of Mixup-shaped pages
  across N synthetic hosts (one mega-host ~30% of pages) used for the
  frontier/politeness/bench runs. Returns (pages_rows, seeds, robots,
  hosts).

`pages.text` (the byte-parity golden) is produced by running
:func:`gocrawler_spark.extract.extract_page` over the generated html —
i.e. the golden column and the Spark extractor share one code path, and
the parity tests pin that code path against the Go semantics.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from .extract import extract_page
from .profiles import AMAZON, MIXUP, synthetic_profile


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _warc_ts(url: str) -> datetime:
    # deterministic timestamp in a fixed 2024 window
    sec = _h("ts/" + url) % (365 * 24 * 3600)
    return datetime.fromtimestamp(1704067200 + sec, tz=timezone.utc)


# ---------------------------------------------------------------------------
# Crawl corpus: host-skewed Mixup-shaped site graph
# ---------------------------------------------------------------------------

BRANDS = ["Sony", "Warner", "EMI", "Universal", "Fonovisa", "S006y"]
GENRES = ["rock", "pop", "jazz", "salsa", "metal", "clasica"]


def hosts_list(n_hosts: int) -> list[str]:
    return [f"shop{k:03d}.example" for k in range(n_hosts)]


def host_of_index(i: int, hosts: list[str]) -> str:
    """Zipf-ish host assignment: host 0 gets ~30% of pages (skew fixture)."""
    r = _h(f"host/{i}") % 100
    if r < 30:
        return hosts[0]
    return hosts[1 + _h(f"host2/{i}") % (len(hosts) - 1)]


def _sku(i: int) -> str:
    return f"{100000000000 + (_h(f'sku/{i}') % 900000000000):012d}"


def _product_url(host: str, i: int) -> str:
    return f"https://{host}/Mixup/detproducto.aspx?sku={_sku(i)}"


def _cat_url(host: str, j: int) -> str:
    return f"https://{host}/Mixup/Categoria.aspx?etq={GENRES[j % len(GENRES)]}{j}"


def _home_url(host: str) -> str:
    return f"https://{host}/Mixup/Home.aspx"


def _price_text(i: int) -> str:
    cents = 999 + (_h(f"price/{i}") % 2000000)
    return f"${cents // 100:,}.{cents % 100:02d}"


def _product_html(host: str, i: int, links: list[str]) -> str:
    name = f"Disco {GENRES[_h(f'g/{i}') % len(GENRES)].title()} Vol {_h(f'v/{i}') % 97}"
    brand = BRANDS[_h(f"b/{i}") % len(BRANDS)]
    n_details = 2 + _h(f"nd/{i}") % 3
    details = "\n".join(
        f"      Detalle{k}: valor {_h(f'd/{i}/{k}') % 1000}" for k in range(n_details)
    )
    list_price = _price_text(i * 2 + 1)
    offer_price = _price_text(i)
    anchors = "\n".join(f'      <a href="{u}">link</a>' for u in links)
    desc = f"Descripcion del producto {i}: edicion {_h(f'e/{i}') % 50}."
    return f"""<html><head>
  <meta property="og:image" content="https://{host}/img/{i}.jpg">
  <meta name="twitter:image" content="https://{host}/img/tw{i}.jpg">
  <meta name="Description" content="kw{i % 7},musica,{brand}">
  <meta name="Keywords" content="Producto {i} en {host}">
  <title>{name}</title>
</head><body>
  <div class="wrapper">
    <div class="detail">
      {name}
      {brand}
{details}
    </div>
  </div>
  <div class="productcontent">
    <div id="tabs-res">
      {desc}
    </div>
  </div>
  <div class="actions">
    <span class="preciolistaNewDet descartado">Precio de lista: $9,999.99</span>
    <span class="preciolistaNewDet">Precio de lista: {list_price}</span>
    <span class="precioofertaNewDet">Precio: {offer_price}</span>
    <a href="#buy">Comprar</a>
  </div>
  <div class="nav">
{anchors}
  </div>
</body></html>"""


def _captcha_html(host: str, links: list[str]) -> str:
    anchors = "\n".join(f'  <a href="{u}">x</a>' for u in links)
    return f"""<html><body>
<form action="/errors/validateCaptcha">
  Escribe los caracteres: <input id="captchacharacters" name="field-keywords" type="text">
</form>
{anchors}
</body></html>"""


def _listing_html(host: str, title: str, links: list[str]) -> str:
    anchors = "\n".join(f'    <a href="{u}">item {k}</a>' for k, u in enumerate(links))
    return f"""<html><head>
  <meta name="Description" content="listado,{title}">
  <meta name="Keywords" content="Listado {title} de {host}">
  <title>{title}</title>
</head><body>
  <h1>{title}</h1>
  <div class="listing">
{anchors}
    <a href="">vacio</a>
    <a href="#top">top</a>
  </div>
</body></html>"""


def crawl_corpus(n_pages: int = 2000, n_hosts: int = 40):
    """Build the synthetic site graph.

    Structure per host: Home -> categorias; categoria -> products +
    neighbor categoria + home + noise/off-pattern links; product ->
    home + a couple of products (cross-links). ~70% of pages are
    products. Returns (pages, seeds, robots, hosts, profile) where
    pages rows are dicts (url, warc_ts, html(bytes), text, lang).
    """
    hosts = hosts_list(n_hosts)
    profile = synthetic_profile(tuple(hosts))

    # partition page indices per host
    by_host: dict[str, list[int]] = {h: [] for h in hosts}
    for i in range(n_pages):
        by_host[host_of_index(i, hosts)].append(i)

    urls: dict[str, tuple] = {}  # url -> ('product', host, i, links) etc.
    for h, idxs in by_host.items():
        if not idxs:
            continue
        n_cat = max(1, len(idxs) // 12)
        cat_urls = [_cat_url(h, j) for j in range(n_cat)]
        prod_idxs = idxs
        prod_urls = [_product_url(h, i) for i in prod_idxs]
        home = _home_url(h)

        # home page links: all categorias + noise + one cross-host home
        cross = _home_url(hosts[_h(f"x/{h}") % len(hosts)])
        noise = [
            f"https://{h}/other/page{_h(f'n/{h}') % 50}.html",  # off-pattern
            f"https://evil.example/Mixup/Home.aspx",  # disallowed host
            "/Mixup/Productos.aspx",  # relative, missing etq -> rejected by F2
        ]
        urls[home] = ("listing", h, f"Home {h}", cat_urls + noise + [cross])

        # categoria pages: chunk products round-robin
        for j, cu in enumerate(cat_urls):
            chunk = prod_urls[j::n_cat]
            neighbor = cat_urls[(j + 1) % n_cat]
            links = chunk + [neighbor, home, f"/Mixup/detproducto.aspx?sku=bad{j}"]
            urls[cu] = ("listing", h, f"Categoria {j} {h}", links)

        # product pages: link home + 2 sibling products (relative + absolute);
        # every 29th page is a captcha interstitial (S9 quarantine path,
        # amazon.go:290-295 — selector works for any profile)
        for k, (i, pu) in enumerate(zip(prod_idxs, prod_urls)):
            sib1 = prod_urls[(k + 1) % len(prod_urls)]
            sib2_rel = "detproducto.aspx?sku=" + _sku(prod_idxs[(k + 2) % len(prod_idxs)])
            kind = "captcha" if _h(f"cap/{i}") % 29 == 0 else "product"
            urls[pu] = (kind, h, i, [home, sib1, sib2_rel])

    pages = []
    for url, spec in urls.items():
        kind, h = spec[0], spec[1]
        if kind == "product":
            html = _product_html(h, spec[2], spec[3])
        elif kind == "captcha":
            html = _captcha_html(h, spec[3])
        else:
            html = _listing_html(h, spec[2], spec[3])
        ex = extract_page(url, html, profile)
        pages.append(
            {
                "url": url,
                "warc_ts": _warc_ts(url),
                "html": html.encode("utf-8"),
                "text": ex["text"],
                "lang": "es" if _h("lang/" + h) % 3 else "en",
            }
        )

    seeds = [{"url": _home_url(h), "priority": 0} for h in hosts[: max(2, n_hosts // 8)]]

    robots = []
    for k, h in enumerate(hosts):
        # host 3 disallows everything; every 7th disallows product paths
        if k == 3:
            robots.append({"host": h, "agent": "*", "rule": "disallow",
                           "path_prefix": "/", "crawl_delay_ms": 0})
        elif k % 7 == 5:
            robots.append({"host": h, "agent": "*", "rule": "disallow",
                           "path_prefix": "/Mixup/detproducto", "crawl_delay_ms": 1500})
        else:
            robots.append({"host": h, "agent": "*", "rule": "allow",
                           "path_prefix": "/", "crawl_delay_ms": 1500})
    return pages, seeds, robots, hosts, profile


# ---------------------------------------------------------------------------
# Driver-testdata bridge: render the documents table into a pages corpus
# ---------------------------------------------------------------------------


def doc_host(doc_id: int, n_hosts: int) -> str:
    return f"shop{doc_id % n_hosts:03d}.example"


def doc_url(doc_id: int, n_hosts: int) -> str:
    return f"https://{doc_host(doc_id, n_hosts)}/Mixup/detproducto.aspx?sku={100000000000 + doc_id}"


def pages_from_documents(docs_df, n_hosts: int = 16):
    """Deterministically render the driver's ``documents`` table into a
    ``pages`` web corpus (FIXTURES.md §1 shape): one product page per
    document (name/brand/details/description derived from the row) plus
    one home page per host linking its products. Inputs come from
    /root/testdata — nothing is invented beyond the fixed templates.

    Returns (pages_df(url, warc_ts, html, text, lang), seeds, robots,
    profile)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from .profiles import synthetic_profile

    spark = docs_df.sparkSession
    n_docs = docs_df.count()
    hosts = tuple(f"shop{k:03d}.example" for k in range(n_hosts))
    profile = synthetic_profile(hosts)

    def render(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang, source, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"], pdf["n_chars"]
            ):
                doc_id = int(doc_id)
                host = doc_host(doc_id, n_hosts)
                url = doc_url(doc_id, n_hosts)
                words = str(text).split()
                name = f"Doc {doc_id} " + " ".join(words[:3])
                price = f"${(int(n_chars) % 9000) / 100 + 10:,.2f}"
                links = [
                    f"https://{host}/Mixup/Home.aspx",
                    doc_url((doc_id + n_hosts) % n_docs, n_hosts),
                    doc_url((doc_id * 7 + 3) % n_docs, n_hosts),
                ]
                anchors = "\n".join(f'  <a href="{u}">l</a>' for u in links)
                html = f"""<html><head>
  <meta name="Description" content="{lang},{source}">
  <meta name="Keywords" content="Documento {doc_id}">
</head><body>
  <div class="w"><div class="detail">
    {name}
    {source}
    Lang: {lang}
    Chars: {n_chars}
  </div></div>
  <div class="productcontent"><div id="tabs-res">{str(text)[:120]}</div></div>
  <div class="actions">
    <span class="precioofertaNewDet">Precio: {price}</span>
  </div>
{anchors}
</body></html>"""
                rows.append((url, _warc_ts(url), html.encode(), str(lang)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "lang"])

    prod_pages = docs_df.select("doc_id", "text", "lang", "source", "n_chars").mapInPandas(
        render, "url string, warc_ts timestamp, html binary, lang string"
    )

    # home pages: one per host, linking that host's products (collect_list)
    homes_src = docs_df.select(
        (F.col("doc_id") % n_hosts).cast("int").alias("h"), "doc_id"
    ).groupBy("h").agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))

    def render_home(batches):
        for pdf in batches:
            rows = []
            for h, ids in zip(pdf["h"], pdf["ids"]):
                host = f"shop{int(h):03d}.example"
                url = f"https://{host}/Mixup/Home.aspx"
                anchors = "\n".join(
                    f'  <a href="{doc_url(int(i), n_hosts)}">p{int(i)}</a>' for i in ids
                )
                html = f"""<html><head><meta name="Keywords" content="Home {host}"></head>
<body><h1>Home {host}</h1>
{anchors}
</body></html>"""
                rows.append((url, _warc_ts(url), html.encode(), "es"))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "lang"])

    home_pages = homes_src.mapInPandas(
        render_home, "url string, warc_ts timestamp, html binary, lang string"
    )

    pages = prod_pages.unionByName(home_pages)

    # golden text column via the shared extractor (byte-parity invariant)
    from .extract import extract_text
    from .htmlmini import parse_html

    def add_text(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = [extract_text(parse_html(bytes(h))) for h in pdf["html"]]
            yield pdf[["url", "warc_ts", "html", "text", "lang"]]

    pages = pages.mapInPandas(
        add_text, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    seeds = [
        {"url": f"https://{hosts[k]}/Mixup/Home.aspx", "priority": 0}
        for k in range(min(4, n_hosts))
    ]
    robots = []
    for k, h in enumerate(hosts):
        # heterogeneous Crawl-delay: every 5th host (k%5==2) is slow
        # (3000 ms) so a budgeted crawl provably shapes per-host credits
        delay = 3000 if k % 5 == 2 else 1500
        if k == 3:
            robots.append({"host": h, "agent": "*", "rule": "disallow",
                           "path_prefix": "/Mixup/detproducto", "crawl_delay_ms": delay})
        else:
            robots.append({"host": h, "agent": "*", "rule": "allow",
                           "path_prefix": "/", "crawl_delay_ms": delay})
    return pages, seeds, robots, profile


# ---------------------------------------------------------------------------
# Parity corpus: real-shaped Mixup + Amazon pages (unit tests)
# ---------------------------------------------------------------------------

MIXUP_PRODUCT_URL = "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=194397052312"
MIXUP_HOME_URL = "https://www.mixup.com.mx/Mixup/Home.aspx"
AMAZON_PRODUCT_URL = "https://www.amazon.com.mx/Apple-MacBook-Air/dp/B08N6ST99B/ref=sr_1_2"
AMAZON_SEARCH_URL = "https://www.amazon.com.mx/s?k=macbook"
AMAZON_CAPTCHA_URL = "https://www.amazon.com.mx/errors/validateCaptcha/dp/B000000000/x"

MIXUP_PRODUCT_HTML = """<html><head>
  <meta property="og:image" content="https://cdn.mixup.com/im.jpg">
  <meta name="twitter:image" content="https://cdn.mixup.com/tw.jpg">
  <meta name="Description" content="rock,cd,sony">
  <meta name="Keywords" content="Un disco de rock">
</head><body>
  <div class="outer">
    <div class="detail">
      The Wall  (Deluxe)
      Pink Floyd
      Formato:   CD
      Genero: Rock
      Discos:  2
      SinValor
    </div>
  </div>
  <div class="productcontent">
    <div id="tabs-res">  Edicion remasterizada
       con libreto.  </div>
  </div>
  <div class="actions">
    <span class="preciolistaNewDet descartado">Precio de lista: $499.00</span>
    <span class="preciolistaNewDet">Precio de lista: $ 399.00</span>
    <span class="precioofertaNewDet">Precio: $  349.50</span>
    <span class="precioofertaNewDet">Sin precio</span>
  </div>
  <a href="detproducto.aspx?sku=194397052313">otro</a>
  <a href="/Mixup/Categoria.aspx?etq=rock">rock</a>
  <a href="https://www.mixup.com.mx/Mixup/Home.aspx">home</a>
  <a href="#frag">frag</a>
  <a href="">empty</a>
</body></html>"""

AMAZON_PRODUCT_HTML = """<html><head><title>MacBook Air</title></head><body>
<div id="centerCol">
  <span class="product-title-word-break">
Apple MacBook Air 13"
</span>
  <div id="bylineInfo_feature_div"><a href="/apple">Apple</a></div>
  <i class="a-icon a-icon-star"><span>4.8 de 5 estrellas</span></i>
  <div id="unifiedPrice_feature_div" data-feature-name="unifiedPrice">
    <span id="priceblock_ourprice">$25,999.00</span>
  </div>
</div>
<div id="productDetails_feature_div">
  <table class="prodDetTable" id="productDetails_techSpec_section_1">
    <tr><th>Marca  </th><td><span>Apple</span><b>ignorado</b> extra</td></tr>
    <tr><th>Peso: del producto</th><td><span>1.29 kg</span></td></tr>
  </table>
</div>
<div id="detailBulletsWrapper_feature_div">
  <div id="detailBullets_feature_div">
    <ul class="a-unordered-list">
      <li><span><span class="a-text-bold">Fabricante: </span><span>Apple Inc</span></span></li>
      <li><span><span class="a-text-bold">Pilas:  incluidas</span><span>Si</span></span></li>
    </ul>
  </div>
</div>
<a id="customer-reviews-content" href="#">reviews</a>
<div class="a-row">
  <div data-hook="top-customer-reviews-widget">
    <div class="a-section celwidget">
      <span class="a-profile-name">Juan</span>
      <i class="review-rating"><span class="a-icon-alt">5.0 de 5 estrellas</span></i>
      <a data-hook="review-title" class="review-title review-title-content"><span>Excelente</span></a>
      <span class="review-date" data-hook="review-date">Revisado el 1 enero 2021</span>
      <span data-hook="review-body"><div class="reviewText" data-hook="review-collapsed"><span>Muy  buena   maquina
rapida</span></div></span>
    </div>
    <div class="a-section celwidget">
      <span class="a-profile-name">Ana</span>
      <i class="review-rating"><span class="a-icon-alt">4.0 de 5 estrellas</span></i>
      <a data-hook="review-title" class="review-title review-title-content"><span>Buena</span></a>
      <span class="review-date" data-hook="review-date">Revisado el 2 enero 2021</span>
      <span data-hook="review-body"><div class="reviewText" data-hook="review-collapsed"><span>Cumple</span></div></span>
    </div>
  </div>
</div>
<div class="s-main-slot s-result-list s-search-results sg-row">
  <a href="/Gildan-Camiseta/dp/B077ZKK9YB/ref=sr_1_1">cam</a>
</div>
</body></html>"""

AMAZON_CAPTCHA_HTML = """<html><body>
<form action="/errors/validateCaptcha">
  <input id="captchacharacters" name="field-keywords" type="text">
</form></body></html>"""


def robots_pages(spark, robots: list[dict]):
    """Render rule rows into per-host ``/robots.txt`` page rows
    (url, html) — the fetched-pages form the F5 parser consumes, so
    entry() derives its rules table the way the reference does
    (temoto/robotstxt parse of the fetched body) instead of being
    handed a pre-made table."""
    from .operators.robots_parse import render_robots_txt

    bodies = render_robots_txt(robots)
    rows = [(f"https://{h}/robots.txt", b.encode()) for h, b in sorted(bodies.items())]
    return spark.createDataFrame(rows, "url string, html binary")


def parity_pages():
    """(url, html, profile) triples for extractor unit tests."""
    return [
        (MIXUP_PRODUCT_URL, MIXUP_PRODUCT_HTML, MIXUP),
        (AMAZON_PRODUCT_URL, AMAZON_PRODUCT_HTML, AMAZON),
        (AMAZON_CAPTCHA_URL, AMAZON_CAPTCHA_HTML, AMAZON),
    ]


PROXY_LIST_URL = "https://free-proxy-list.example/"
PROXY_LIST_HTML = """<html><body>
<table id="proxylisttable" class="table">
  <thead><tr><th>IP</th><th>Port</th><th>Code</th><th>Country</th>
    <th>Anonymity</th><th>Google</th><th>Https</th></tr></thead>
  <tbody>
    <tr><td>10.0.0.1</td><td>8080</td><td>MX</td><td>Mexico</td>
        <td>elite proxy</td><td>yes</td><td>Yes</td></tr>
    <tr><td>10.0.0.2</td><td>3128</td><td>US</td><td>United States</td>
        <td>anonymous</td><td>No</td><td>no</td></tr>
    <tr><td>10.0.0.3</td><td> 80 </td><td>DE</td><td>Germany</td>
        <td>transparent</td><td>nope</td><td>YES</td></tr>
    <tr><td>10.0.0.4</td><td>65535</td></tr>
  </tbody>
</table>
<table id="othertable"><tbody><tr><td>1.2.3.4</td><td>9</td><td>X</td>
<td>Y</td><td>Z</td><td>yes</td><td>yes</td></tr></tbody></table>
</body></html>"""

"""Extraction-core parity tests (E1-E16, F8/F9) vs the Go reference
semantics (citations inline)."""

from gocrawler_spark import gofuncs as go
from gocrawler_spark.datagen import (
    AMAZON_CAPTCHA_HTML,
    AMAZON_CAPTCHA_URL,
    AMAZON_PRODUCT_HTML,
    AMAZON_PRODUCT_URL,
    MIXUP_PRODUCT_HTML,
    MIXUP_PRODUCT_URL,
)
from gocrawler_spark.extract import extract_page
from gocrawler_spark.htmlmini import Sel, parse_html
from gocrawler_spark.profiles import AMAZON, MIXUP


def test_gofuncs_currency():
    # currency.go:10-12 — Currency((f*100)+0.5) truncates
    assert go.to_currency_cents(1.23) == 123
    assert go.to_currency_cents(1.345) == 135  # docstring example: 1.345 -> $1.35
    assert go.to_currency_cents(4.35) == 435
    assert go.to_currency_cents(0.0) == 0
    # float trap: 4.35*100 = 434.99999... +0.5 -> 435.49 -> 435
    assert go.to_currency_cents(349.50) == 34950
    assert go.currency_string(34950) == "$349.50"
    assert go.currency_string(0) == "$0.00"


def test_gofuncs_parse_float_go_semantics():
    assert go.parse_float("399.00") == (399.0, True)
    # Go ParseFloat rejects surrounding whitespace (no trimming)
    assert go.parse_float(" 399.00") == (0.0, False)
    assert go.parse_float("399.00 ") == (0.0, False)
    assert go.parse_float("") == (0.0, False)
    assert go.parse_float("x12") == (0.0, False)


def test_gofuncs_ids():
    # md5.go:9-15 + item.go:84-94
    assert go.md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert go.create_id("The Wall(Deluxe)", "Mixup") == go.md5_hex(
        "The Wall(Deluxe)/Mixup"
    )


def test_absolute_url_colly_semantics():
    base = "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=1"
    assert go.absolute_url(base, "#frag") == ""  # fragment-only -> ''
    assert (
        go.absolute_url(base, "detproducto.aspx?sku=2")
        == "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=2"
    )
    assert (
        go.absolute_url(base, "/Mixup/Home.aspx")
        == "https://www.mixup.com.mx/Mixup/Home.aspx"
    )
    # fragments are dropped from resolved URLs
    assert (
        go.absolute_url(base, "https://a.example/p?q=1#x") == "https://a.example/p?q=1"
    )
    assert go.absolute_url(base, "//cdn.example/x") == "https://cdn.example/x"


def test_profile_regexes_pin_go_behavior():
    # mixup.go:28-29 — admission + product classifier
    ok = [
        "https://www.mixup.com.mx/Mixup/Home.aspx",
        "https://www.mixup.com.mx/mixup/home.aspx",
        "https://www.mixup.com.mx/Mixup/Categoria.aspx?etq=rock",
        "https://www.mixup.com.mx/Mixup/Productos.aspx?etq=pop&pg=2",
        "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=194397052312",
    ]
    bad = [
        "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=abc",
        "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=123&x=1",  # $ anchor
        "https://www.mixup.com.mx/Mixup/Categoria.aspx?pg=2",  # missing etq=
        "https://otro.example/Mixup/Home.aspx",
        "https://www.mixup.com.mx/other/page.html",
    ]
    for u in ok:
        assert MIXUP.link_re.search(u), u
    for u in bad:
        assert not MIXUP.link_re.search(u), u
    assert MIXUP.product_re.search(
        "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=194397052312"
    )
    # sku must be >=12 digits for product classification (mixup.go:29)
    assert not MIXUP.product_re.search(
        "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=1943970523"
    )
    # amazon.go:45-46
    assert AMAZON.link_re.search(AMAZON_PRODUCT_URL)
    assert AMAZON.link_re.search("https://www.amazon.com.mx/s?k=macbook")
    assert AMAZON.product_re.search(AMAZON_PRODUCT_URL)
    assert not AMAZON.product_re.search("https://www.amazon.com.mx/s?k=macbook")


def test_mixup_extraction_full():
    ex = extract_page(MIXUP_PRODUCT_URL, MIXUP_PRODUCT_HTML, MIXUP)
    # E1/E2: empty href skipped (mixup.go:86-88), '#frag' -> '' dropped
    assert ex["links"] == [
        "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=194397052313",
        "https://www.mixup.com.mx/Mixup/Categoria.aspx?etq=rock",
        "https://www.mixup.com.mx/Mixup/Home.aspx",
    ]
    # E3: the reference swaps keywords/description (mixup.go:72-73)
    assert ex["keywords"] == "rock,cd,sony"
    assert ex["description"] == "Un disco de rock"
    assert ex["og_image"] == "https://cdn.mixup.com/im.jpg"
    item = ex["item"]
    # E4: field0=name (2+ spaces removed), field1=brand, k:v details
    assert item["name"] == "The Wall(Deluxe)"
    assert item["brand"] == "Pink Floyd"
    assert item["details"] == {"Formato": "CD", "Genero": "Rock", "Discos": "2"}
    # E5: description trimmed only (internal whitespace preserved)
    assert item["description"] == "Edicion remasterizada\n       con libreto."
    # E6: .descartado skipped; ' $ 399.00' fails Go ParseFloat (leading
    # space survives the 2+-space cleaner) -> 0; last non-empty wins ->
    # '$  349.50' -> '$349.50' -> 34950
    assert item["price_cents"] == 34950
    assert item["id"] == go.md5_hex("The Wall(Deluxe)/Mixup")
    assert item["rating"] == 0.0 and item["reviews"] == []


def test_mixup_no_actions_no_item():
    # saveProduct lives in GetProductPrice (mixup.go:162): no div.actions,
    # no item
    html = MIXUP_PRODUCT_HTML.replace('class="actions"', 'class="other"')
    assert extract_page(MIXUP_PRODUCT_URL, html, MIXUP)["item"] is None
    # sku gate (mixup.go:105,117)
    url = "https://www.mixup.com.mx/Mixup/Categoria.aspx?etq=rock"
    assert extract_page(url, MIXUP_PRODUCT_HTML, MIXUP)["item"] is None


def test_amazon_extraction_full():
    ex = extract_page(AMAZON_PRODUCT_URL, AMAZON_PRODUCT_HTML, AMAZON)
    # E1: amazon links only from the s-main-slot result list (amazon.go:101)
    assert ex["links"] == [
        "https://www.amazon.com.mx/Gildan-Camiseta/dp/B077ZKK9YB/ref=sr_1_1"
    ]
    item = ex["item"]
    assert item["name"] == 'Apple MacBook Air 13"'
    assert item["brand"] == "Apple"
    assert item["rating"] == 4.8
    assert item["price_cents"] == 2599900
    # E8 wins over E9 (document order, SetDetails overwrites, amazon.go:209)
    assert item["details"] == {"Fabricante ": "Apple Inc", "Pilasincluidas": "Si"}
    # E10 reviews in widget order; date read-and-discarded (amazon.go:255)
    assert [r["author"] for r in item["reviews"]] == ["Juan", "Ana"]
    assert item["reviews"][0]["stars"] == 5.0
    assert item["reviews"][0]["content"] == "Muybuenamaquinarapida"
    assert item["reviews"][0]["date"] is None
    assert item["id"] == go.md5_hex('Apple MacBook Air 13"/Amazon')


def test_amazon_table_details_when_no_bullets():
    # getDetails (amazon.go:228-240): td contents filtered to spans +
    # text nodes ('<b>ignorado</b>' excluded), KEY_CLEANER applied to both
    html = AMAZON_PRODUCT_HTML.replace('id="detailBulletsWrapper_feature_div"', 'id="x"')
    item = extract_page(AMAZON_PRODUCT_URL, html, AMAZON)["item"]
    assert item["details"] == {"Marca": "Apple extra", "Peso del producto": "1.29 kg"}


def test_amazon_no_reviews_anchor_no_item():
    # item persisted only inside GetProductReviews (amazon.go:284)
    html = AMAZON_PRODUCT_HTML.replace('id="customer-reviews-content"', 'id="nope"')
    assert extract_page(AMAZON_PRODUCT_URL, html, AMAZON)["item"] is None


def test_captcha_detection():
    ex = extract_page(AMAZON_CAPTCHA_URL, AMAZON_CAPTCHA_HTML, AMAZON)
    assert ex["is_captcha"] is True and ex["item"] is None


def test_goquery_text_semantics():
    dom = parse_html("<div><p>a<b>b</b></p>c<span>d</span></div>")
    assert Sel([dom]).find("div").text() == "abcd"
    # selection of multiple nodes concatenates in selection order
    assert Sel([dom]).find("p, span").text() == "abd"


def test_proxy_list_extract():
    """S11 parity pins (switcher.go:118-142): td order, Atoi
    no-trim zero-value, case-insensitive yes flags, short row skipped,
    other tables ignored."""
    from gocrawler_spark.datagen import PROXY_LIST_HTML
    from gocrawler_spark.extract import extract_proxy_list

    rows = extract_proxy_list(PROXY_LIST_HTML.encode())
    assert [r["ip"] for r in rows] == ["10.0.0.1", "10.0.0.2", "10.0.0.3"]
    assert rows[0] == {"ip": "10.0.0.1", "port": 8080, "code": "MX",
                       "country": "Mexico", "anonymity": "elite proxy",
                       "google": True, "ssl": True}
    assert rows[1]["google"] is False and rows[1]["ssl"] is False
    # ' 80 ' fails Go Atoi (no trimming) -> zero-value port
    assert rows[2]["port"] == 0 and rows[2]["ssl"] is True


def test_fast_parser_matches_stdlib():
    """htmlmini's regex tokenizer must produce a node-for-node identical
    DOM (tags, attrs, and exact TEXT-NODE SPLITS — Contents()-based
    extraction is byte-parity-pinned on those) to the html.parser
    reference, across the full fixture corpus plus adversarial
    constructs (raw-text script/style, charrefs, lone '<', EOF-truncated
    tags/comments, bogus end tags)."""
    from gocrawler_spark.datagen import (
        PROXY_LIST_HTML,
        crawl_corpus,
        parity_pages,
    )
    from gocrawler_spark.htmlmini import parse_html, parse_html_stdlib

    def ser(node, out):
        if node.is_text:
            out.append(("T", node.data))
            return
        out.append(("E", node.tag, tuple(sorted(node.attrs.items()))))
        for c in node.children:
            ser(c, out)
        out.append(("/",))

    def check(html, label):
        a, b = [], []
        ser(parse_html(html), a)
        ser(parse_html_stdlib(html), b)
        assert a == b, f"{label}: fast parser diverges from html.parser"

    cases = [
        '<div class="a" id=b data-x=\'c\'>t &amp; u</div>',
        "<script>if (a<b && c>d) {}</script><p>x</p>",
        "<!-- comment --><p>y</p>", '<br><img src="x"/><p>z',
        '<DIV CLASS="Up">M</DIV>', '<a href="?a=1&amp;b=2">l</a>',
        "<p>a < b</p>", "<style>.x{}</style>", "<td><td>1<td>2",
        "<input value=unquoted>", "<p>&nbsp;&#65;</p>",
        "<script>never closed", "<p", "</>", "</ x>",
        "<!doctype html><p>d</p>", "<?pi ?><p>e</p>", "<p>tail<",
        "<p>amp& loose</p>", "<p>&notareal;</p>",
        "<SCRIPT>UP</SCRIPT>after", "<style>a</STYLE>b",
        '<a href = "x" >y</a>', '<div  a="1"  b>k</div>',
        "<p>x<!-- unterminated", "<em/>done", '<a b="c>d">t</a>',
        "<p>x<!bogus", "<p>x<?pi", "<p>x</unclosed", '<p>x<div a="b',
        "<p>x<di", "<p>&amp", "<p>a&ampb</p>", "<p>&#x41;&#X42;</p>",
    ]
    for i, c in enumerate(cases):
        check(c, f"case{i}")
    pages, *_ = crawl_corpus(n_pages=300, n_hosts=10)
    for p in pages:
        h = p["html"]
        check(h.decode() if isinstance(h, bytes) else h, p["url"])
    for url, html, _prof in parity_pages():
        check(html, url)
    check(PROXY_LIST_HTML, "proxy")


def test_indexed_select_matches_subtree_walk():
    """The tag-index select path (order-interval candidate pruning) must
    return the exact node sequence the subtree walk returns, for every
    selector the extractor uses, from both root and nested contexts.
    Dropping ``tag_index`` from a parsed root forces the walk, so the
    two engines run over the identical DOM."""
    from gocrawler_spark.datagen import PROXY_LIST_HTML, crawl_corpus, parity_pages
    from gocrawler_spark.htmlmini import parse_html, select

    selectors = [
        "a", "div", "span", "*", "nosuchtag",
        "div.detail", "div.actions", "div#tabs-res",
        "span.preciolistaNewDet, span.precioofertaNewDet",
        'meta[name="keywords"]', 'meta[property="og:title"]',
        "div#centerCol", "span.product-title-word-break",
        "div#bylineInfo_feature_div a", "i.a-icon.a-icon-star",
        "div#detailBullets_feature_div ul.a-unordered-list li span",
        'table.prodDetTable[id*="productDetails_detailBullets"]',
        "i.review-rating span.a-icon-alt", 'a[data-hook="review"]',
        "input#captchacharacters", "table#proxylisttable tbody tr",
        "div > span", "li ~ li", "div.detail span, div.actions a",
    ]

    pages, *_ = crawl_corpus(n_pages=120, n_hosts=8)
    docs = [p["html"] for p in pages[:60]]
    docs += [html for _u, html, _p in parity_pages()]
    docs.append(PROXY_LIST_HTML)

    checked = 0
    for html in docs:
        root = parse_html(html)
        for sel in selectors:
            fast = select(root, sel)
            # nested contexts: every div and the first table, if any
            nests = select(root, "div")[:3] + select(root, "table")[:1]
            fast_nested = [select(c, sel) for c in nests]
            root.tag_index = None  # force the walk engine
            slow = select(root, sel)
            slow_nested = [select(c, sel) for c in nests]
            root = parse_html(html)  # re-index for the next selector
            assert [id(n) for n in fast] == [id(n) for n in slow] or [
                (n.tag, n.order) for n in fast
            ] == [(n.tag, n.order) for n in slow], sel
            assert [[(n.tag, n.order) for n in g] for g in fast_nested] == [
                [(n.tag, n.order) for n in g] for g in slow_nested
            ], sel
            checked += 1
    assert checked > 1000

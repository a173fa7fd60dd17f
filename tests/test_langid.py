"""TextCat n-gram language ID: accuracy anchor on planted multilingual
docs + pipeline schema/shape (rows-only driver entry)."""

import pyarrow as pa
import pyarrow.parquet as pq

# two-sentence samples per language (longer than the classifier's noise
# floor; written for the test, not copied from the profile word lists)
SAMPLES = {
    "en": "the results of the experiment were published in the journal"
          " and they show that the method works well for large inputs",
    "de": "die ergebnisse des experiments wurden in der zeitschrift"
          " veröffentlicht und sie zeigen dass die methode gut"
          " funktioniert für große eingaben",
    "fr": "les résultats de cette expérience ont été publiés dans le"
          " journal et ils montrent que la méthode fonctionne bien pour"
          " les grandes entrées",
    "es": "los resultados del experimento fueron publicados en la"
          " revista y muestran que el método funciona bien para entradas"
          " grandes",
    "it": "i risultati dell esperimento sono stati pubblicati sulla"
          " rivista e mostrano che il metodo funziona bene per grandi"
          " input",
    "pt": "os resultados do experimento foram publicados na revista e"
          " mostram que o método funciona bem para entradas grandes",
    "nl": "de resultaten van het experiment werden gepubliceerd in het"
          " tijdschrift en ze laten zien dat de methode goed werkt voor"
          " grote invoer",
    "pl": "wyniki eksperymentu zostały opublikowane w czasopiśmie i"
          " pokazują że metoda działa bardzo dobrze dla dużych danych",
    "tr": "deneyin sonuçları dergide yayınlandı ve yöntemin büyük"
          " girdiler için çok iyi çalıştığını gösteriyor",
    "ru": "результаты эксперимента были опубликованы в журнале и они"
          " показывают что метод хорошо работает для больших данных",
    "uk": "результати експерименту були опубліковані в журналі і вони"
          " показують що метод добре працює для великих даних",
    "ja": "実験の結果は雑誌に掲載されそして大きな入力に対して手法がうまく"
          "機能することを示しています",
    "zh": "实验结果发表在期刊上并且表明该方法对于大型输入效果良好",
    "ko": "실험 결과는 저널에 게재되었으며 이 방법이 큰 입력에 대해 잘"
          " 작동함을 보여줍니다",
    "ar": "نُشرت نتائج التجربة في المجلة وهي تظهر أن الطريقة تعمل"
          " بشكل جيد مع المدخلات الكبيرة",
    "hi": "प्रयोग के परिणाम पत्रिका में प्रकाशित हुए और वे दिखाते हैं कि"
          " विधि बड़े इनपुट के लिए अच्छी तरह काम करती है",
    "el": "τα αποτελέσματα του πειράματος δημοσιεύθηκαν στο περιοδικό"
          " και δείχνουν ότι η μέθοδος λειτουργεί καλά",
    "th": "ผลการทดลองได้รับการตีพิมพ์ในวารสารและแสดงให้เห็นว่าวิธีนี้ทำงานได้ดี",
    "id": "hasil percobaan diterbitkan dalam jurnal dan menunjukkan"
          " bahwa metode ini bekerja dengan baik untuk masukan besar",
    "vi": "kết quả của thí nghiệm đã được công bố trên tạp chí và chúng"
          " cho thấy phương pháp hoạt động tốt với đầu vào lớn",
}


def test_classifier_accuracy_anchor():
    from open_source_search_engine_ray.functions.langid import (
        LANGID_LANGS, classify)

    assert len(LANGID_LANGS) >= 20
    correct = sum(1 for lg, s in SAMPLES.items() if classify(s)[0] == lg)
    assert correct >= 0.9 * len(SAMPLES), (
        correct, {lg: classify(s)[0] for lg, s in SAMPLES.items()})


def test_classifier_empty_and_und():
    from open_source_search_engine_ray.functions.langid import classify

    assert classify("") == ("und", 0.0)
    assert classify("   \n  ") == ("und", 0.0)


def test_lang_id_ngram_pipeline(ray_session, tmp_path):
    from open_source_search_engine_ray.pipelines.text_analysis import (
        lang_id_ngram)

    items = sorted(SAMPLES.items())
    tbl = pa.table({
        "doc_id": pa.array(range(len(items)), pa.int64()),
        "lang": pa.array([lg for lg, _ in items]),
        "text": pa.array([s for _, s in items], pa.string()),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/documents.parquet")
    out = lang_id_ngram(sf).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "lang_pred", "confidence"]
    hits = sum(1 for (lg, _), pred in zip(items, out["lang_pred"])
               if pred == lg)
    assert hits >= 0.9 * len(items)
    assert (out["confidence"] >= 0.0).all()

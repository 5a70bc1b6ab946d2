package graft.operators

/** Solr's language-identification update processor
  * (solr/contrib/langid/src/java/org/apache/solr/update/processor/
  * LanguageIdentifierUpdateProcessor.java:44-402, LangIdParams.java):
  * detect the language of configured input fields at index time, resolve
  * it through lcmap normalization / whitelist / certainty threshold /
  * fallback-field-then-fallback-value, write it to `langField` (unless
  * pre-existing and !overwrite), collect every detected code into
  * `langsField`, and optionally REMAP field contents into language-suffixed
  * fields (`text` -> `text_en`) via the `(.*)` -> `$1_{lang}` pattern with
  * map.lcmap collapsing (e.g. zh/ja/ko -> cjk), keepOrig, per-field
  * individual re-detection, and enforceSchema null-on-unknown-field.
  *
  * The processor is detector-agnostic in the reference (Tika and LangDetect
  * subclasses implement detectLanguage); here the detector is a plugged
  * function, and the engine's stopword-profile langId
  * (TextAnalysis.langId) is the production detector.
  *
  * Pure per-document function — on Spark it runs as a zero-shuffle row map
  * inside the update chain (operators/UpdateChain), exactly the posture an
  * index-time processor needs at 100 TB.
  */
object LangIdUpdate {

  /** reference DetectedLanguage.java */
  final case class Detected(langCode: String, certainty: Double)

  /** Config mirror of LangIdParams defaults (LangIdParams.java:26-58). */
  final case class Config(
      inputFields: Seq[String],
      langField: Option[String] = None,
      langsField: Option[String] = None,
      fallbackValue: Option[String] = None,
      fallbackFields: Seq[String] = Nil,
      overwrite: Boolean = false,
      threshold: Double = 0.5,
      whitelist: Set[String] = Set.empty,
      lcMap: Map[String, String] = Map.empty,
      mapEnable: Boolean = false,
      mapFields: Seq[String] = Nil, // empty -> inputFields
      mapKeepOrig: Boolean = false,
      mapIndividual: Boolean = false,
      mapIndividualFields: Seq[String] = Nil, // empty -> mapFields
      mapLcMap: Map[String, String] = Map.empty,
      mapPattern: String = "(.*)",
      mapReplace: String = "$1_{lang}",
      enforceSchema: Boolean = true,
      schemaFields: Option[Set[String]] = None, // None = accept any field
      maxFieldValueChars: Int = 10000,
      maxTotalChars: Int = 20000) {
    def effectiveMapFields: Seq[String] =
      if (mapFields.nonEmpty) mapFields else inputFields
    def effectiveIndividual: Set[String] =
      (if (mapIndividualFields.nonEmpty) mapIndividualFields
       else effectiveMapFields).toSet
  }

  /** lcmap normalization (normalizeLangCode). */
  def normalizeLangCode(cfg: Config, langCode: String): String =
    cfg.lcMap.getOrElse(langCode, langCode)

  /** Candidate-list resolution (resolveLanguage,
    * LanguageIdentifierUpdateProcessor.java:302-330): first candidate only;
    * lcmap-normalize, then whitelist gate, then certainty >= threshold;
    * otherwise fallback; null/absent fallback resolves to "". */
  def resolveLanguage(cfg: Config, languages: Seq[Detected],
                      fallbackLang: Option[String]): String = {
    val resolved = languages.headOption match {
      case None => fallbackLang
      case Some(lang) =>
        val normalized = normalizeLangCode(cfg, lang.langCode)
        if (cfg.whitelist.isEmpty || cfg.whitelist.contains(normalized)) {
          if (lang.certainty >= cfg.threshold) Some(normalized)
          else fallbackLang
        } else fallbackLang
    }
    resolved.filter(_.nonEmpty).getOrElse("")
  }

  /** Mapped output field name (getMappedField,
    * LanguageIdentifierUpdateProcessor.java:380-390): map.lcmap collapse,
    * regex pattern/replace, {lang} substitution; null when enforceSchema
    * and the result is not a schema field. */
  def getMappedField(cfg: Config, currentField: String,
                     language: String): Option[String] = {
    val lc = cfg.mapLcMap.getOrElse(language, language)
    val renamed = currentField.replaceFirst(cfg.mapPattern, cfg.mapReplace)
      .replaceFirst("\\{lang\\}", java.util.regex.Matcher.quoteReplacement(lc))
    if (cfg.enforceSchema && cfg.schemaFields.exists(!_.contains(renamed)))
      None
    else Some(renamed)
  }

  /** Fallback language: first PRESENT fallback field's value, else the
    * fallback value (getFallbackLang). */
  private def fallbackLang(cfg: Config,
                           doc: Map[String, Seq[String]]): Option[String] =
    cfg.fallbackFields.collectFirst {
      case f if doc.contains(f) => doc(f).headOption.getOrElse("")
    }.orElse(cfg.fallbackValue)

  /** Detection input: each field's values truncated to maxFieldValueChars,
    * all capped at maxTotalChars (the subclasses' concatFields bound). */
  def detectionText(cfg: Config, doc: Map[String, Seq[String]]): String = {
    val sb = new StringBuilder
    for (f <- cfg.inputFields; v <- doc.getOrElse(f, Nil)
         if sb.length < cfg.maxTotalChars) {
      val take = math.min(math.min(v.length, cfg.maxFieldValueChars),
        cfg.maxTotalChars - sb.length)
      sb.append(v.substring(0, take)).append(' ')
    }
    sb.result()
  }

  /** The main per-document process()
    * (LanguageIdentifierUpdateProcessor.java:190-276). */
  def process(cfg: Config, doc: Map[String, Seq[String]],
              detect: String => Seq[Detected]): Map[String, Seq[String]] = {
    var out = doc
    val fb = fallbackLang(cfg, doc)
    val docLangs = scala.collection.mutable.LinkedHashSet.empty[String]

    val docLang: String =
      if (cfg.langField.forall(lf => !doc.contains(lf)) || cfg.overwrite) {
        val lang = resolveLanguage(cfg, detect(detectionText(cfg, doc)), fb)
        docLangs += lang
        cfg.langField.filter(_.nonEmpty).foreach(lf =>
          out = out.updated(lf, Seq(lang)))
        lang
      } else {
        // pre-existing value sanity-checked against whitelist + threshold
        val existing = doc(cfg.langField.get).headOption.getOrElse("")
        val lang = resolveLanguage(cfg, Seq(Detected(existing, 1.0)), fb)
        docLangs += lang
        lang
      }

    if (cfg.mapEnable) {
      for (field <- cfg.effectiveMapFields.distinct if out.contains(field)) {
        val fieldLang =
          if (cfg.mapIndividual && cfg.effectiveIndividual.contains(field)) {
            val l = resolveLanguage(cfg,
              detect(detectionText(cfg.copy(inputFields = Seq(field)), doc)),
              Some(docLang))
            docLangs += l
            l
          } else docLang
        getMappedField(cfg, field, fieldLang) match {
          case Some(mapped) =>
            out = out.updated(mapped, out(field))
            if (!cfg.mapKeepOrig && mapped != field) out = out.removed(field)
          case None => // enforceSchema miss: mapping skipped (logged in ref)
        }
      }
    }

    cfg.langsField.filter(_.nonEmpty).foreach(lf =>
      out = out.updated(lf, docLangs.toSeq))
    out
  }

  /** The engine's production detector: stopword-profile counts over
    * [a-z0-9]+ tokens (the same rule as TextAnalysis.langId / the SQL
    * oracle's token CTE); certainty 1.0 when any stop hit exists. */
  def stopwordDetector(text: String): Seq[Detected] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for (m <- "[a-z0-9]+".r.findAllIn(text)) {
      for ((lang, set) <- TextAnalysis.Candidates if set.contains(m))
        counts(lang) = counts.getOrElse(lang, 0) + 1
    }
    if (counts.isEmpty) Nil
    else {
      val (lang, _) = counts.toSeq.minBy { case (l, h) => (-h, l) }
      Seq(Detected(lang, 1.0))
    }
  }
}

package graft.meta

/** Year-versioned metadata resolution.
  *
  * Reproduces the semantics of the reference's resolver
  * (hbsir/utils/metadata_utils.py:140-254, executable spec at
  * hbsir/metadata/_instruction.yaml):
  *
  *   - "simple versioning": a map whose keys are ALL integers within
  *     `yearRange` means "value applies for year >= key"; the greatest
  *     key <= year wins; no key <= year -> null.
  *   - "keyword versioning": a map containing a `versions` sub-map; the
  *     selected version is overlaid with the sibling keys (siblings do
  *     NOT overwrite keys present in the version).
  *   - `{}` results coerce to null (metadata_utils.py:230-233).
  *   - Resolution recurses over the whole document.
  */
final case class ResolverSettings(
    yearRange: (Int, Int) = (1350, 1450),
    yearKeyword: String = "year",
    versionKeyword: String = "versions",
    itemsKeyword: String = "items",
    categoryKeyword: String = "categories",
    itemKeyName: String = "item_key",
)

class VersionResolver(
    metadata: Meta,
    year: Int,
    settings: ResolverSettings = ResolverSettings(),
) {

  def getVersion: Meta = retrieve(metadata)

  private def retrieve(element: Meta): Meta = element match {
    case MNull | _: MInt | _: MDbl | _: MStr | _: MBool => element
    case MList(items) => MList(items.map(retrieve))
    case m: MMap =>
      val resolved = retrieveDictVersion(m)
      resolved match {
        case rm: MMap if detectVersionType(rm) == NotVersioned =>
          MMap(rm.entries.map { case (k, v) => k -> retrieve(v) })
        case other => retrieve(other)
      }
  }

  sealed trait VersionType
  case object KeywordVersioned extends VersionType
  case object SimpleVersioned extends VersionType
  case object NotVersioned extends VersionType

  def detectVersionType(m: MMap): VersionType = {
    if (m.keys.contains(SKey(settings.versionKeyword))) KeywordVersioned
    else {
      // empty map is vacuously simple (reference: loop over no keys -> simple)
      val ok = m.keys.forall {
        case IKey(i) => i >= settings.yearRange._1 && i <= settings.yearRange._2
        case _       => false
      }
      if (ok) SimpleVersioned else NotVersioned
    }
  }

  private def findVersionNumber(m: MMap): Long = {
    var selected = 0L
    m.keys.foreach {
      case IKey(i) if i <= year => selected = math.max(selected, i)
      case _                    =>
    }
    selected
  }

  private def retrieveDictVersion(m: MMap): Meta =
    detectVersionType(m) match {
      case NotVersioned => m
      case SimpleVersioned =>
        val n = findVersionNumber(m)
        val v = if (n == 0) MMap(Vector.empty) else m.get(n).getOrElse(MNull)
        coerceEmpty(v)
      case KeywordVersioned =>
        val versions = m(settings.versionKeyword) match {
          case vm: MMap => vm
          case MNull    => MMap(Vector.empty)
          case other    => throw new IllegalArgumentException(s"bad versions: $other")
        }
        val n = findVersionNumber(versions)
        val selectedRaw =
          if (n == 0) MMap(Vector.empty) else versions.get(n).getOrElse(MNull)
        val selected = selectedRaw match {
          case MNull   => MMap(Vector.empty)
          case other   => other
        }
        val merged = selected match {
          case sm: MMap =>
            // Overlay: sibling keys (minus `versions`) that the selected
            // version does not already define. metadata_utils.py:214-229.
            val extra = m.entries.filter { case (k, _) =>
              k != SKey(settings.versionKeyword) &&
              !sm.keys.contains(k)
            }
            MMap(sm.entries ++ extra)
          case other => other
        }
        coerceEmpty(merged)
    }

  private def coerceEmpty(m: Meta): Meta = m match {
    case MMap(e) if e.isEmpty => MNull
    case other                => other
  }

  def isVersioned: Boolean = isVersioned(metadata)

  def isVersioned(element: Meta): Boolean = element match {
    case MNull | _: MInt | _: MDbl | _: MStr | _: MBool => false
    case MList(items) => items.exists(isVersioned)
    case m: MMap =>
      detectVersionType(m) != NotVersioned ||
      m.entries.exists { case (_, v) => isVersioned(v) }
  }
}

/** Category expansion: splits `items` entries carrying `categories` into one
  * item per category, inheriting shared keys; each emitted item gets
  * `item_key` = original key with leading/trailing '_' stripped.
  * Reference: MetadataCategoryResolver (hbsir/utils/metadata_utils.py:257-363),
  * spec at hbsir/metadata/_instruction.yaml:101-145.
  */
class CategoryResolver(
    metadata: Meta,
    year: Int,
    settings: ResolverSettings = ResolverSettings(),
) extends VersionResolver(metadata, year, settings) {

  def categorizeMetadata: MMap = {
    val resolved = getVersion match {
      case m: MMap => m
      case other   => throw new IllegalArgumentException(s"not a map: $other")
    }
    val itemsMap = resolved(settings.itemsKeyword).asMap
    val items = itemsMap.flatMap { case (key, item) =>
      getCategories(item).map { cat =>
        MMap(cat.asMap :+ (SKey(settings.itemKeyName): MKey) ->
          (MStr(key.asString.stripPrefix("_").stripSuffix("_")): Meta))
      }
    }
    MMap(resolved.entries.map {
      case (SKey(k), _) if k == settings.itemsKeyword =>
        (SKey(k): MKey) -> (MList(items.map(m => m: Meta)): Meta)
      case other => other
    })
  }

  private def getCategories(item: Meta): Vector[Meta] = item match {
    case m: MMap if m.has(settings.categoryKeyword) =>
      val cats = m(settings.categoryKeyword).asMap
      val sortedCats = cats.sortBy {
        case (IKey(i), _) => i
        case (SKey(s), _) => s.toLong
      }
      val sharedKeys = m.entries.filter(_._1 != SKey(settings.categoryKeyword))
      sortedCats.map { case (_, cat) =>
        val cm = cat.asMap
        val inherited = sharedKeys.filter { case (k, _) => !cm.exists(_._1 == k) }
        MMap(cm ++ inherited)
      }
    case _ => Vector(item)
  }
}

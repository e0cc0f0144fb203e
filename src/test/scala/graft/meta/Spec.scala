package graft.meta

/** Executable spec for the version-resolution algebra, ported from the
  * reference's hbsir/metadata/_instruction.yaml (notation + expected
  * interpretation pairs). This is test fixture DATA mirroring the
  * published spec, not engine code.
  */
object Spec {
  val instructionYaml: String =
    """
simple_versioned:
  1360: {1360-1: 60-1, 1360-2: 60-2, 1360-3: 60-3}
  1380: {1380-1: 80-1, 1380-2: 80-2, 1380-3: 80-3}
simple_versioned_0: null
simple_versioned_1360: {1360-1: 60-1, 1360-2: 60-2, 1360-3: 60-3}
simple_versioned_1380: {1380-1: 80-1, 1380-2: 80-2, 1380-3: 80-3}

keyword_versioned:
  shared-1: sh-1
  shared-2: sh-2
  shared-3: sh-3
  versions:
    1360: {1360-1: 60-1, 1360-2: 60-2, 1360-3: 60-3}
    1380: {1380-1: 80-1, 1380-2: 80-2, 1380-3: 80-3}
keyword_versioned_0: {shared-1: sh-1, shared-2: sh-2, shared-3: sh-3}
keyword_versioned_1360:
  {shared-1: sh-1, shared-2: sh-2, shared-3: sh-3,
   1360-1: 60-1, 1360-2: 60-2, 1360-3: 60-3}
keyword_versioned_1380:
  {shared-1: sh-1, shared-2: sh-2, shared-3: sh-3,
   1380-1: 80-1, 1380-2: 80-2, 1380-3: 80-3}

categorized:
  key1: k1
  key2: k2
  key3: k3
  items:
    item_1:
      shared-1: sh-1
      shared-2: sh-2
      shared-3: sh-3
      categories:
        1: {category1-1: cat1-1, category1-2: cat1-2, category1-3: cat1-3}
        2: {category2-1: cat2-1, category2-2: cat2-2, category2-3: cat2-3}
categorized_opened:
  key1: k1
  key2: k2
  key3: k3
  items:
    - {shared-1: sh-1, shared-2: sh-2, shared-3: sh-3,
       category1-1: cat1-1, category1-2: cat1-2, category1-3: cat1-3,
       item_key: item_1}
    - {shared-1: sh-1, shared-2: sh-2, shared-3: sh-3,
       category2-1: cat2-1, category2-2: cat2-2, category2-3: cat2-3,
       item_key: item_1}

sample_1:
  key1: val1
  key2:
    versions: {1360: val2-60, 1370: val2-70, 1380: val2-80}
  key3: {1360: val3-60, 1370: val3-70, 1380: val3-80}
  key4:
    key4-1: val4-1
    key4-2:
      versions: {1360: val4-2-60, 1370: val4-2-70, 1380: val4-2-80}
    key4-3: {1360: val4-3-60, 1370: val4-3-70, 1380: val4-3-80}
  key5:
    key5-1: val5-1
    key5-2: val5-2
    key5-3: val5-3
    versions:
      1360: {key5-4: val5-4-60, key5-5: val5-5-60, key5-6: val5-6-60}
      1370: {key5-4: val5-4-70, key5-5: val5-5-70, key5-6: val5-6-70}
      1380: {key5-4: val5-4-80, key5-5: val5-5-80, key5-6: val5-6-80}
  key6:
    1360: {key6-1: val6-1-60, key6-2: val6-2-60, key6-3: val6-3-60}
    1370: {key6-1: val6-1-70, key6-2: val6-2-70, key6-3: val6-3-70}
    1380: {key6-1: val6-1-80, key6-2: val6-2-80, key6-3: val6-3-80}
sample_1_0:
  key1: val1
  key2: null
  key3: null
  key4: {key4-1: val4-1, key4-2: null, key4-3: null}
  key5: {key5-1: val5-1, key5-2: val5-2, key5-3: val5-3}
  key6: null
sample_1_1360:
  key1: val1
  key2: val2-60
  key3: val3-60
  key4: {key4-1: val4-1, key4-2: val4-2-60, key4-3: val4-3-60}
  key5: {key5-1: val5-1, key5-2: val5-2, key5-3: val5-3,
         key5-4: val5-4-60, key5-5: val5-5-60, key5-6: val5-6-60}
  key6: {key6-1: val6-1-60, key6-2: val6-2-60, key6-3: val6-3-60}
sample_1_1370:
  key1: val1
  key2: val2-70
  key3: val3-70
  key4: {key4-1: val4-1, key4-2: val4-2-70, key4-3: val4-3-70}
  key5: {key5-1: val5-1, key5-2: val5-2, key5-3: val5-3,
         key5-4: val5-4-70, key5-5: val5-5-70, key5-6: val5-6-70}
  key6: {key6-1: val6-1-70, key6-2: val6-2-70, key6-3: val6-3-70}
sample_1_1380:
  key1: val1
  key2: val2-80
  key3: val3-80
  key4: {key4-1: val4-1, key4-2: val4-2-80, key4-3: val4-3-80}
  key5: {key5-1: val5-1, key5-2: val5-2, key5-3: val5-3,
         key5-4: val5-4-80, key5-5: val5-5-80, key5-6: val5-6-80}
  key6: {key6-1: val6-1-80, key6-2: val6-2-80, key6-3: val6-3-80}

sample_2:
  key1:
    key1-1:
      1360: val1-1-60
      1370: {key1-1-1: val1-1-1-1-70, key1-1-2: val1-1-1-2-70, key1-1-3: val1-1-1-3-70}
      1380: [elm1-1-1-80, elm1-1-2-80, elm1-1-3-80]
sample_2_0: {key1: {key1-1: null}}
sample_2_1360: {key1: {key1-1: val1-1-60}}
sample_2_1370:
  key1:
    key1-1: {key1-1-1: val1-1-1-1-70, key1-1-2: val1-1-1-2-70, key1-1-3: val1-1-1-3-70}
sample_2_1380:
  key1:
    key1-1: [elm1-1-1-80, elm1-1-2-80, elm1-1-3-80]

sample_3:
  key1:
    1360: val1-60
    1370:
      key1-1: val1-1-70
      key1-2: val1-2-70
      key1-3: val1-3-70
      versions:
        1375: {key1-2: val1-3-75}
        1380: {key1-3: val1-3-80}
sample_3_0: {key1: null}
sample_3_1360: {key1: val1-60}
sample_3_1370: {key1: {key1-1: val1-1-70, key1-2: val1-2-70, key1-3: val1-3-70}}
sample_3_1375: {key1: {key1-1: val1-1-70, key1-2: val1-3-75, key1-3: val1-3-70}}
sample_3_1380: {key1: {key1-1: val1-1-70, key1-2: val1-2-70, key1-3: val1-3-80}}
"""
}

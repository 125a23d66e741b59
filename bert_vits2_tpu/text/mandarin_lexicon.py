"""Embedded hanzi -> pinyin fallback lexicon.

The reference uses pypinyin (text/chinese.py:4); when it is unavailable this
module supplies tone-numbered pinyin for common characters plus word-level
overrides for frequent polyphones. Curated by hand for coverage of everyday
text; unknown characters yield None (caller maps them to UNK/skip).

Install pypinyin for full coverage — `mandarin._word_pinyin` prefers it
automatically.
"""

from __future__ import annotations

# Word-level readings override per-character ones (polyphones).
WORD_PINYIN: dict[str, list[str]] = {
    "银行": ["yin2", "hang2"],
    "行业": ["hang2", "ye4"],
    "行列": ["hang2", "lie4"],
    "自行车": ["zi4", "xing2", "che1"],
    "长大": ["zhang3", "da4"],
    "成长": ["cheng2", "zhang3"],
    "长城": ["chang2", "cheng2"],
    "队长": ["dui4", "zhang3"],
    "校长": ["xiao4", "zhang3"],
    "音乐": ["yin1", "yue4"],
    "快乐": ["kuai4", "le4"],
    "乐趣": ["le4", "qu4"],
    "觉得": ["jue2", "de5"],
    "睡觉": ["shui4", "jiao4"],
    "教学": ["jiao4", "xue2"],
    "教书": ["jiao1", "shu1"],
    "还是": ["hai2", "shi4"],
    "还有": ["hai2", "you3"],
    "归还": ["gui1", "huan2"],
    "重要": ["zhong4", "yao4"],
    "重新": ["chong2", "xin1"],
    "重复": ["chong2", "fu4"],
    "得到": ["de2", "dao4"],
    "得意": ["de2", "yi4"],
    "非得": ["fei1", "dei3"],
    "地方": ["di4", "fang1"],
    "土地": ["tu3", "di4"],
    "都市": ["du1", "shi4"],
    "首都": ["shou3", "du1"],
    "发现": ["fa1", "xian4"],
    "头发": ["tou2", "fa4"],
    "干净": ["gan1", "jing4"],
    "干活": ["gan4", "huo2"],
    "种地": ["zhong4", "di4"],
    "种子": ["zhong3", "zi5"],
    "传说": ["chuan2", "shuo1"],
    "传记": ["zhuan4", "ji4"],
    "数学": ["shu4", "xue2"],
    "数数": ["shu3", "shu4"],
    "倒是": ["dao4", "shi4"],
    "摔倒": ["shuai1", "dao3"],
    "差不多": ["cha4", "bu5", "duo1"],
    "出差": ["chu1", "chai1"],
    "相信": ["xiang1", "xin4"],
    "相片": ["xiang4", "pian4"],
    "调查": ["diao4", "cha2"],
    "调整": ["tiao2", "zheng3"],
    "会计": ["kuai4", "ji4"],
    "便宜": ["pian2", "yi5"],
    "方便": ["fang1", "bian4"],
    "着急": ["zhao2", "ji2"],
    "沉着": ["chen2", "zhuo2"],
    "为了": ["wei4", "le5"],
    "因为": ["yin1", "wei4"],
    "为什么": ["wei4", "shen2", "me5"],
    "认为": ["ren4", "wei2"],
    "好奇": ["hao4", "qi2"],
    "爱好": ["ai4", "hao4"],
    "只有": ["zhi3", "you3"],
    "一只": ["yi4", "zhi1"],
    "应该": ["ying1", "gai1"],
    "答应": ["da1", "ying5"],
    "大夫": ["dai4", "fu5"],
    "弹琴": ["tan2", "qin2"],
    "子弹": ["zi3", "dan4"],
    "假期": ["jia4", "qi1"],
    "真假": ["zhen1", "jia3"],
    "空气": ["kong1", "qi4"],
    "有空": ["you3", "kong4"],
    "中间": ["zhong1", "jian1"],
    "间隔": ["jian4", "ge2"],
    "北京": ["bei3", "jing1"],
    "上海": ["shang4", "hai3"],
    "世界": ["shi4", "jie4"],
    "你好": ["ni3", "hao3"],
    "谢谢": ["xie4", "xie5"],
}

# Single-character default readings (most frequent reading).
_CHAR_DATA = """
的de5 一yi1 是shi4 了le5 我wo3 不bu4 人ren2 在zai4 他ta1 有you3 这zhe4 个ge4
上shang4 们men5 来lai2 到dao4 时shi2 大da4 地di4 为wei4 子zi3 中zhong1 你ni3
说shuo1 生sheng1 国guo2 年nian2 着zhe5 就jiu4 那na4 和he2 要yao4 她ta1 出chu1
也ye3 得de5 里li3 后hou4 自zi4 以yi3 会hui4 家jia1 可ke3 下xia4 而er2 过guo4
天tian1 去qu4 能neng2 对dui4 小xiao3 多duo1 然ran2 于yu2 心xin1 学xue2 么me5
之zhi1 都dou1 好hao3 看kan4 起qi3 发fa1 当dang1 没mei2 成cheng2 只zhi3 如ru2
事shi4 把ba3 还hai2 用yong4 第di4 样yang4 道dao4 想xiang3 作zuo4 种zhong3
开kai1 美mei3 总zong3 从cong2 无wu2 情qing2 己ji3 面mian4 最zui4 女nv3 但dan4
现xian4 前qian2 些xie1 所suo3 同tong2 日ri4 手shou3 又you4 行xing2 意yi4
动dong4 方fang1 期qi1 它ta1 头tou2 经jing1 长chang2 儿er2 回hui2 位wei4
分fen1 爱ai4 老lao3 因yin1 很hen3 给gei3 名ming2 法fa3 间jian1 斯si1 知zhi1
世shi4 什shen2 两liang3 次ci4 使shi3 身shen1 者zhe3 被bei4 高gao1 已yi3
亲qin1 其qi2 进jin4 此ci3 话hua4 常chang2 与yu3 活huo2 正zheng4 感gan3
见jian4 明ming2 问wen4 力li4 理li3 尔er3 点dian3 文wen2 几ji3 定ding4
本ben3 公gong1 特te4 做zuo4 外wai4 孩hai2 相xiang1 西xi1 果guo3 走zou3
将jiang1 月yue4 十shi2 实shi2 向xiang4 声sheng1 车che1 全quan2 信xin4
重zhong4 三san1 机ji1 工gong1 物wu4 气qi4 每mei3 并bing4 别bie2 真zhen1
打da3 太tai4 新xin1 比bi3 才cai2 便bian4 夫fu1 再zai4 书shu1 部bu4 水shui3
像xiang4 眼yan3 等deng3 体ti3 却que4 加jia1 电dian4 主zhu3 界jie4 门men2
利li4 海hai3 受shou4 听ting1 表biao3 德de2 少shao3 克ke4 代dai4 员yuan2
许xu3 稜leng2 先xian1 口kou3 由you2 死si3 安an1 写xie3 性xing4 马ma3 光guang1
白bai2 或huo4 住zhu4 难nan2 望wang4 教jiao4 命ming4 花hua1 结jie2 乐le4
色se4 更geng4 拉la1 东dong1 神shen2 记ji4 处chu4 让rang4 母mu3 父fu4 应ying1
直zhi2 字zi4 场chang3 平ping2 报bao4 友you3 关guan1 放fang4 至zhi4 张zhang1
认ren4 接jie1 告gao4 入ru4 笑xiao4 内nei4 英ying1 军jun1 候hou4 民min2
岁sui4 往wang3 何he2 度du4 山shan1 觉jue2 路lu4 带dai4 万wan4 男nan2 边bian1
风feng1 解jie3 叫jiao4 任ren4 金jin1 快kuai4 原yuan2 吃chi1 妈ma1 变bian4
通tong1 师shi1 立li4 象xiang4 数shu4 四si4 失shi1 满man3 战zhan4 远yuan3
格ge2 士shi4 音yin1 轻qing1 目mu4 条tiao2 呢ne5 病bing4 始shi3 达da2 深shen1
完wan2 今jin1 提ti2 求qiu2 清qing1 王wang2 化hua4 空kong1 业ye4 思si1 切qie4
怎zen3 非fei1 找zhao3 片pian4 罗luo2 钱qian2 吗ma5 语yu3 元yuan2 喜xi3
曾ceng2 离li2 飞fei1 科ke1 言yan2 干gan1 流liu2 欢huan1 约yue1 各ge4 即ji2
指zhi3 合he2 反fan3 题ti2 必bi4 该gai1 论lun4 交jiao1 终zhong1 林lin2 请qing3
医yi1 晚wan3 制zhi4 球qiu2 决jue2 窢xu1 传chuan2 画hua4 保bao3 读du2 运yun4
及ji2 则ze2 房fang2 早zao3 院yuan4 量liang4 苦ku3 火huo3 布bu4 品pin3 近jin4
坐zuo4 产chan3 答da2 星xing1 精jing1 视shi4 五wu3 连lian2 司si1 巴ba1
奇qi2 管guan3 类lei4 未wei4 朋peng2 且qie3 婚hun1 台tai2 夜ye4 青qing1
北bei3 队dui4 久jiu3 乎hu1 越yue4 观guan1 落luo4 尽jin4 形xing2 影ying3
红hong2 爸ba4 百bai3 令ling4 周zhou1 吧ba5 识shi2 步bu4 希xi1 亚ya4 术shu4
留liu2 市shi4 半ban4 热re4 送song4 兴xing4 造zao4 谈tan2 容rong2 极ji2
随sui2 演yan3 收shou1 首shou3 根gen1 讲jiang3 整zheng3 式shi4 取qu3 照zhao4
办ban4 强qiang2 石shi2 古gu3 华hua2 谁shei2 拿na2 计ji4 您nin2 装zhuang1
似si4 足zu2 双shuang1 妻qi1 尼ni2 转zhuan3 诉su4 米mi3 称chen1 丽li4 客ke4
南nan2 领ling3 节jie2 衣yi1 站zhan4 黑hei1 刻ke4 统tong3 断duan4 福fu2
城cheng2 故gu4 历li4 惊jing1 脸lian3 选xuan3 包bao1 紧jin3 争zheng1 另ling4
建jian4 维wei2 绝jue2 树shu4 系xi4 伤shang1 示shi4 愿yuan4 持chi2 千qian1
史shi3 谷gu3 研yan2 突tu1 皮pi2 酒jiu3 丝si1 级ji2 按an4 务wu4 资zi1
排pai2 州zhou1 香xiang1 施shi1 味wei4 易yi4 顾gu4 毛mao2 永yong3 父fu4
般ban1 底di3 某mou3 官guan1 共gong4 响xiang3 借jie4 盘pan2 设she4 林lin2
县xian4 姐jie3 汉han4 局ju2 尝chang2 育yu4 异yi4 江jiang1 餐can1 价jia4
河he2 改gai3 据ju4 支zhi1 低di1 食shi2 须xu1 图tu2 室shi4 久jiu3 众zhong4
跟gen1 穿chuan1 介jie4 急ji2 型xing2 昨zuo2 营ying2 待dai4 秒miao3 哥ge1
款kuan3 停ting2 区qu1 毕bi4 票piao4 层ceng2 村cun1 检jian3 团tuan2 圆yuan2
班ban1 段duan4 黄huang2 速su4 显xian3 压ya1 盛sheng4 啊a5 评ping2 商shang1
准zhun3 弟di4 宝bao3 妹mei4 净jing4 遇yu4 剧ju4 虽sui1 座zuo4 倒dao3
杀sha1 较jiao4 室shi4 灯deng1 河he2 股gu3 舞wu3 義yi4 哪na3 呀ya5 验yan4
绿lv4 超chao1 睡shui4 猫mao1 狗gou3 鸟niao3 鱼yu2 虫chong2 草cao3 叶ye4
雨yu3 雪xue3 云yun2 雷lei2 冰bing1 暖nuan3 冷leng3 凉liang2 秋qiu1 冬dong1
夏xia4 春chun1 季ji4 节jie2 假jia3 害hai4 怕pa4 恐kong3 惧ju4 勇yong3
敢gan3 慢man4 跑pao3 跳tiao4 游you2 泳yong3 唱chang4 歌ge1 跳tiao4 舞wu3
玩wan2 耍shua3 休xiu1 息xi1 工gong1 作zuo4 累lei4 困kun4 饿e4 渴ke3 饱bao3
甜tian2 酸suan1 辣la4 咸xian2 淡dan4 汤tang1 菜cai4 饭fan4 肉rou4 蛋dan4
奶nai3 茶cha2 糖tang2 盐yan2 油you2 酱jiang4 醋cu4 杯bei1 盘pan2 碗wan3
筷kuai4 勺shao2 刀dao1 叉cha1 锅guo1 灶zao4 厨chu2 房fang2 桌zhuo1 椅yi3
床chuang2 被bei4 枕zhen3 窗chuang1 帘lian2 墙qiang2 顶ding3 梯ti1 楼lou2
街jie1 巷xiang4 桥qiao2 湖hu2 池chi2 井jing3 田tian2 园yuan2 林lin2 森sen1
岛dao3 岸an4 浪lang4 沙sha1 泥ni2 土tu3 尘chen2 烟yan1 雾wu4 晨chen2
午wu3 暗an4 亮liang4 阴yin1 晴qing2 温wen1 凤feng4 龙long2 虎hu3 狮shi1
象xiang4 熊xiong2 猴hou2 鸡ji1 鸭ya1 鹅e2 猪zhu1 羊yang2 牛niu2 兔tu4
鼠shu3 蛇she2 龟gui1 蛙wa1 蚊wen2 蝶die2 蜂feng1 蚁yi3 脑nao3 脚jiao3
腿tui3 臂bei4 肩jian1 背bei4 胸xiong1 腹fu4 腰yao1 膝xi1 趾zhi3 肤fu1
骨gu3 血xue4 汗han4 泪lei4 牙ya2 舌she2 唇chun2 喉hou2 肺fei4 肝gan1
胃wei4 肠chang2 药yao4 疼teng2 痛tong4 伤shang1 愈yu4 康kang1 健jian4
壮zhuang4 弱ruo4 瘦shou4 胖pang4 矮ai3 厚hou4 薄bao2 宽kuan1 窄zhai3
粗cu1 细xi4 尖jian1 钝dun4 软ruan3 硬ying4 湿shi1 干gan1 脏zang1 乱luan4
齐qi2 整zheng3 碎sui4 破po4 旧jiu4 嫩nen4 熟shu2 咱zan2 俩lia3 仨sa1
啥sha2 咋za3 嘛ma5 哦o5 嗯en1 哈ha1 嘿hei1 哇wa1 哎ai1 唉ai4 喂wei4
嗨hai1 嘘xu1 哼heng1 嘟du1 叮ding1 咚dong1 铃ling2 鼓gu3 琴qin2 笛di2
棋qi2 剑jian4 枪qiang1 炮pao4 弓gong1 箭jian4 盾dun4 旗qi2 鼓gu3 号hao4
灰hui1 棕zong1 紫zi3 粉fen3 橙cheng2 银yin2 铜tong2 铁tie3 钢gang1 锡xi1
铝lv3 锌xin1 铅qian1 玉yu4 珠zhu1 宝bao3 钻zuan4 煤mei2 炭tan4 矿kuang4
岩yan2 洞dong4 谷gu3 峰feng1 坡po1 崖ya2 沟gou1 渠qu2 坝ba4 堤di1 港gang3
湾wan1 洋yang2 洲zhou1 欧ou1 美mei3 非fei1 澳ao4 俄e2 印yin4 韩han2 泰tai4
越yue4 缅mian3 巴ba1 伊yi1 叙xu4 沙sha1 埃ai1 肯ken3 埔pu3 智zhi4 秘mi4
墨mo4 古gu3 加jia1 英ying1 法fa3 德de2 意yi4 荷he2 瑞rui4 丹dan1 挪nuo2
芬fen1 波bo1 捷jie2 匈xiong1 希xi1 葡pu2
"""

CHAR_PINYIN: dict[str, str] = {}
for _tok in _CHAR_DATA.split():
    CHAR_PINYIN.setdefault(_tok[0], _tok[1:])


def word_to_pinyin(word: str) -> list[str | None]:
    """Word -> per-character tone-numbered pinyin (None for unknown chars)."""
    if word in WORD_PINYIN:
        return list(WORD_PINYIN[word])
    out: list[str | None] = []
    i = 0
    while i < len(word):
        # greedy word-override lookup inside longer jieba tokens
        matched = False
        for j in range(min(len(word), i + 4), i + 1, -1):
            sub = word[i:j]
            if sub in WORD_PINYIN:
                out.extend(WORD_PINYIN[sub])
                i = j
                matched = True
                break
        if matched:
            continue
        out.append(CHAR_PINYIN.get(word[i]))
        i += 1
    return out
